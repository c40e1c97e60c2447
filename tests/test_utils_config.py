"""Utils + config system tests."""

import numpy as np
import pytest

from diarizen_tpu.config import apply_overrides, dump_toml, instantiate, load_toml, resolve
from diarizen_tpu.utils import Timer, clamp_inf_value, prepare_empty_dir, set_random_seed


def test_instantiate_and_resolve():
    fn = resolve("numpy.zeros")
    assert fn is np.zeros
    out = instantiate("numpy.full", {"shape": (2,), "fill_value": 3.0})
    np.testing.assert_array_equal(out, [3.0, 3.0])
    # extra kwargs override args
    out = instantiate("numpy.full", {"shape": (2,), "fill_value": 3.0}, fill_value=5.0)
    np.testing.assert_array_equal(out, [5.0, 5.0])


def test_toml_roundtrip(tmp_path):
    cfg = {
        "meta": {"seed": 3407, "save_dir": "exp"},
        "model": {"path": "pkg.mod.Cls", "args": {"lr": 1e-3, "flags": [1, 2, 3],
                                                  "use": True, "name": 'a"b'}},
    }
    dump_toml(cfg, tmp_path / "c.toml")
    back = load_toml(tmp_path / "c.toml")
    assert back == cfg


def test_apply_overrides():
    cfg = {"a": {"b": 1}, "c": 2}
    out = apply_overrides(cfg, {"a.b": 9, "a.new": 4, "d.e": 5})
    assert out["a"]["b"] == 9 and out["a"]["new"] == 4 and out["d"]["e"] == 5
    assert cfg["a"]["b"] == 1  # original untouched


def test_utils(tmp_path):
    set_random_seed(1)
    a = np.random.rand(3)
    set_random_seed(1)
    np.testing.assert_array_equal(a, np.random.rand(3))

    x = np.array([1.0, np.inf, -np.inf, np.nan])
    np.testing.assert_array_equal(clamp_inf_value(x), [1.0, 1e10, -1e10, 0.0])

    d = prepare_empty_dir(tmp_path / "x")
    (d / "f").write_text("1")
    d2 = prepare_empty_dir(tmp_path / "x")  # wiped
    assert not (d2 / "f").exists()
    prepare_empty_dir(tmp_path / "x", resume=True)

    with Timer() as t:
        pass
    assert t.elapsed >= 0


def test_distributed_single_process():
    from diarizen_tpu.parallel.distributed import (
        broadcast_from_host,
        gather_to_host,
        is_main_process,
    )

    assert is_main_process()
    x = np.arange(4.0)
    np.testing.assert_array_equal(gather_to_host(x), x)
    np.testing.assert_array_equal(broadcast_from_host(x), x)
