"""Config/registry unit tests (mirrors reference tests/test_utils.py scope, widened)."""

import os.path as osp

import pytest

from yanerf_tpu.utils import Config, ConfigDict, DictAction, Registry

DATA_DIR = osp.join(osp.dirname(__file__), "configs")


def test_registry_register_and_build():
    reg = Registry("things")

    @reg.register_module()
    class Widget:
        def __init__(self, size=1):
            self.size = size

    assert "Widget" in reg
    obj = reg.build({"type": "Widget", "size": 3})
    assert isinstance(obj, Widget) and obj.size == 3

    with pytest.raises(KeyError):
        reg.build({"type": "Missing"})

    with pytest.raises(KeyError):

        @reg.register_module()
        class Widget:  # noqa: F811 — duplicate registration must fail
            pass


def test_registry_build_error_wraps_class_name():
    reg = Registry("things")

    @reg.register_module()
    class Fragile:
        def __init__(self):
            raise ValueError("boom")

    with pytest.raises(ValueError, match="Fragile: boom"):
        reg.build({"type": "Fragile"})


def test_config_dict_attribute_access():
    cfg = ConfigDict({"a": 1, "b": {"c": [1, {"d": 2}]}})
    assert cfg.a == 1
    assert cfg.b.c[1].d == 2
    cfg.e = {"f": 3}
    assert cfg.e.f == 3
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_config_from_yaml_and_build(tmp_path):
    reg = Registry("models_t")

    @reg.register_module()
    class Tiny:
        def __init__(self, width, depth=2):
            self.width, self.depth = width, depth

    cfg_file = tmp_path / "m.yml"
    cfg_file.write_text("model:\n  type: Tiny\n  width: 8\n")
    cfg = Config.fromfile(cfg_file)
    obj = reg.build(cfg.model)
    assert obj.width == 8 and obj.depth == 2


def test_config_base_inheritance(tmp_path):
    (tmp_path / "base.yml").write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    (tmp_path / "child.yml").write_text("_base_: base.yml\nb: 2\nnested:\n  y: 3\n")
    cfg = Config.fromfile(tmp_path / "child.yml")
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.nested.x == 1 and cfg.nested.y == 3


def test_config_delete_key(tmp_path):
    (tmp_path / "base.yml").write_text("node:\n  keep: 1\n  old: 2\n")
    (tmp_path / "child.yml").write_text("_base_: base.yml\nnode:\n  _delete_: true\n  fresh: 3\n")
    cfg = Config.fromfile(tmp_path / "child.yml")
    assert dict(cfg.node) == {"fresh": 3}


def test_merge_into_does_not_mutate_overrides():
    from yanerf_tpu.utils.config import merge_into

    base = {"node": {"keep": 1, "old": 2}}
    overrides = {"node": {"_delete_": True, "fresh": 3}}
    first = merge_into(overrides, base)
    second = merge_into(overrides, base)
    assert first == second == {"node": {"fresh": 3}}
    assert overrides == {"node": {"_delete_": True, "fresh": 3}}


def test_config_file_dirname_substitution(tmp_path):
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.yml").write_text('path: "{{fileDirname}}/data"\n')
    cfg = Config.fromfile(sub / "c.yml")
    assert cfg.path == f"{sub}/data"


def test_config_base_reference(tmp_path):
    (tmp_path / "base.yml").write_text("dims:\n  width: 64\n")
    (tmp_path / "child.yml").write_text("_base_: base.yml\nmodel_width: '{{_base_.dims.width}}'\n")
    cfg = Config.fromfile(tmp_path / "child.yml")
    assert cfg.model_width == 64


def test_config_python_file(tmp_path):
    (tmp_path / "c.py").write_text("a = dict(b=[1, 2], c='s')\nn = 4\n")
    cfg = Config.fromfile(tmp_path / "c.py")
    assert cfg.a.b == [1, 2] and cfg.a.c == "s" and cfg.n == 4


def test_merge_from_dict():
    cfg = Config({"pipeline": {"model": {"n_layers": 8}}, "datasets": [{"split": "train"}]})
    cfg.merge_from_dict({"pipeline.model.n_layers": 4, "datasets.0.split": "val"})
    assert cfg.pipeline.model.n_layers == 4
    assert cfg.datasets[0].split == "val"


def test_dict_action_parsing():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg_options", nargs="+", action=DictAction)
    args = parser.parse_args(
        ["--cfg_options", "a=1", "b=2.5", "c=true", "d=none", "e=[1,2]", "f=x,y", "g=[(1,2),(3,4)]"]
    )
    opts = args.cfg_options
    assert opts["a"] == 1 and opts["b"] == 2.5 and opts["c"] is True and opts["d"] is None
    assert opts["e"] == [1, 2]
    assert opts["f"] == ["x", "y"]
    assert opts["g"] == [(1, 2), (3, 4)]


def test_config_dump_roundtrip(tmp_path):
    cfg = Config({"a": 1, "b": {"c": [1, 2, 3]}})
    out = tmp_path / "dumped.yml"
    cfg.dump(out)
    cfg2 = Config.fromfile(out)
    assert cfg2.a == 1 and cfg2.b.c == [1, 2, 3]


def test_fileio_load_dump(tmp_path):
    from yanerf_tpu.utils import fileio

    obj = {"x": [1, 2], "y": "z"}
    for ext in ("json", "yml", "pkl"):
        path = str(tmp_path / f"f.{ext}")
        fileio.dump(obj, path)
        assert fileio.load(path) == obj
    text = fileio.dump(obj, file_format="json")
    assert "\"x\"" in text


def test_config_fromstring():
    cfg = Config.fromstring("a: 1\nb:\n  c: [2, 3]\n", ".yml")
    assert cfg.a == 1 and cfg.b.c == [2, 3]
    cfg_py = Config.fromstring("x = dict(y=4)\n", ".py")
    assert cfg_py.x.y == 4


def test_timer_and_check_time():
    import time as _time

    from yanerf_tpu.utils import Timer, check_time

    t = Timer()
    _time.sleep(0.01)
    assert t.since_start() >= 0.01
    first = t.since_last_check()
    assert first < 0.01  # checked right after since_start reset the mark
    assert check_time("test_timer_id") == 0.0  # first call registers
    _time.sleep(0.005)
    assert check_time("test_timer_id") >= 0.005


def test_print_log_variants(capsys):
    from yanerf_tpu.utils import print_log

    print_log("to stdout", logger=None)
    assert "to stdout" in capsys.readouterr().out
    print_log("silenced", logger="silent")
    assert capsys.readouterr().out == ""


def test_fileio_backend_registry_complete():
    import pytest

    from yanerf_tpu.utils.fileio.backends import FileClient

    # Full reference storage matrix (ref file_client.py:47-710).
    for name in ("disk", "http", "lmdb", "memcached", "petrel", "ceph"):
        assert name in FileClient._backends
    # Optional backends fail with a clear ImportError, not at dispatch time.
    with pytest.raises(ImportError, match="ceph"):
        FileClient("ceph")


def test_registry_unknown_scope_returns_none_and_bare_decorator_registers():
    from yanerf_tpu.utils.registry import Registry

    root = Registry("widgets", scope="yanerf_tpu")
    # unknown scope prefix at the ROOT registry must not recurse forever
    assert root.get("no_such_scope.Foo") is None

    reg = Registry("gadgets")

    @reg.register_module  # bare-decorator slip (no parentheses)
    class Gadget:
        pass

    assert reg.get("Gadget") is Gadget
    assert Gadget.__name__ == "Gadget"  # symbol still the class, not a closure


def test_dict_action_bracketed_bare_words_and_merge_edges():
    from yanerf_tpu.utils.config import Config, DictAction

    assert DictAction._parse_value("[train,val]") == ["train", "val"]
    assert DictAction._parse_value("[train]") == ["train"]
    assert DictAction._parse_value("[(a,b),(c,d)]") == [("a", "b"), ("c", "d")]
    assert DictAction._parse_value("[1,2.5,true]") == [1, 2.5, True]

    # tuple element override (py configs preserve tuples)
    cfg = Config(dict(milestones=(100, 200)))
    cfg.merge_from_dict({"milestones.0": 50})
    assert list(cfg.milestones) == [50, 200]

    # non-integer key into a list: clean error, not AttributeError
    cfg2 = Config(dict(datasets=[dict(split="train")]))
    with pytest.raises(KeyError, match="non-integer"):
        cfg2.merge_from_dict({"datasets.foo.bar": 1})


def test_fileio_dump_routes_through_backend_dispatch(tmp_path):
    """dump() must dispatch writes like load() dispatches reads: read-only
    backends give a clear unsupported error, disk writes still work."""
    from yanerf_tpu.utils.fileio import dump, load

    path = str(tmp_path / "x.json")
    dump({"a": 1}, path)
    assert load(path) == {"a": 1}
    with pytest.raises(NotImplementedError, match="does not support writing"):
        dump({"a": 1}, "http://localhost:1/x.json")
