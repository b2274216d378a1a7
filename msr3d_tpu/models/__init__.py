# importing the subpackage registers all model builders
from msr3d_tpu.models import build as _build  # noqa: F401
