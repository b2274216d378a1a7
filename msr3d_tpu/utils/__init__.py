from msr3d_tpu.utils.io import (load_json, save_json, load_jsonl, save_jsonl,
                                load_yaml, save_yaml, load_pickle, save_pickle,
                                load_torch_pickle, make_dir)
from msr3d_tpu.utils.logging import MetricLogger, StepTimer, get_logger
