import textwrap

import pytest

from msr3d_tpu.config import apply_overrides, cfg2dict, load_config


@pytest.fixture
def cfg_file(tmp_path):
    text = textwrap.dedent(
        """
        name: MSR3D
        solver:
          lr: ${solver.optim.args.lr}
          optim:
            name: AdamW
            args:
              lr: 3e-5
              betas: [0.9, 0.999]
        data:
          base: /data
          anno_dir: ${data.base}/scannet
          max_obj_len: ${wrapper.args.max_obj_len}
        wrapper:
          args:
            max_obj_len: 60
        model:
          prompter:
            model:
              name: OSE3DSituation
              hidden_size: 256
        """
    )
    p = tmp_path / "cfg.yaml"
    p.write_text(text)
    return p


def test_interpolation_whole_value_preserves_type(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg.solver.lr == 3e-5
    assert isinstance(cfg.solver.lr, float)
    assert cfg.data.max_obj_len == 60


def test_interpolation_string_embedding(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg.data.anno_dir == "/data/scannet"


def test_overrides_then_interpolation(cfg_file):
    cfg = load_config(cfg_file, overrides=["solver.optim.args.lr=1e-4", "wrapper.args.max_obj_len=30"])
    assert cfg.solver.lr == 1e-4
    assert cfg.data.max_obj_len == 30


def test_override_creates_new_keys(cfg_file):
    cfg = load_config(cfg_file, overrides=["debug.flag=true", "debug.debug_size=20"])
    assert cfg.debug.flag is True
    assert cfg.debug.debug_size == 20


def test_attr_and_get_access(cfg_file):
    cfg = load_config(cfg_file)
    assert cfg.model.prompter.model.name == "OSE3DSituation"
    assert cfg.model.prompter.model.get("situation_type", "as_object") == "as_object"
    assert "name" in cfg
    with pytest.raises(AttributeError):
        _ = cfg.nonexistent


def test_cfg2dict_resolves(cfg_file):
    cfg = load_config(cfg_file)
    d = cfg2dict(cfg)
    assert d["solver"]["lr"] == 3e-5
    assert d["data"]["anno_dir"] == "/data/scannet"
    assert isinstance(d["solver"]["optim"]["args"]["betas"], list)


def test_apply_overrides_scalar_parsing():
    data = {}
    apply_overrides(data, ["a=3", "b=3.5", "c=true", "d=foo", "e=[1,2]", "f=null"])
    assert data == {"a": 3, "b": 3.5, "c": True, "d": "foo", "e": [1, 2], "f": None}


def test_registry_roundtrip():
    from msr3d_tpu.registry import Registry

    reg = Registry("test")

    @reg.register()
    class Foo:
        pass

    assert reg.get("Foo") is Foo
    assert "Foo" in reg
    with pytest.raises(KeyError):
        reg.get("Bar")
    with pytest.raises(ValueError):
        @reg.register(name="Foo")
        class Foo2:
            pass
