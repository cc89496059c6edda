"""Aux subsystems: checkpoint/resume, CLI, timers, logging."""
import json
import subprocess
import sys

import numpy as np

from cmsbwt_tpu.config import Config
from cmsbwt_tpu.engine.pipeline import compute_bwt
from cmsbwt_tpu.utils.checkpoint import CheckpointManager
from cmsbwt_tpu.utils.timing import PhaseTimer

from helpers import make_inputs, mutate, random_dna


def test_checkpoint_roundtrip(tmp_path):
    ck = CheckpointManager(str(tmp_path / "ck"))
    fp = ck.fingerprint(a=1, b="x")
    arrays = {"x": np.arange(5), "y": np.ones(3, np.uint8)}
    ck.save("phase1", fp, arrays)
    got = ck.load("phase1", fp)
    np.testing.assert_array_equal(got["x"], arrays["x"])
    # stale fingerprint rejected
    assert ck.load("phase1", ck.fingerprint(a=2)) is None
    # missing
    assert ck.load("nope", fp) is None


def test_dense_checkpoint_resume(tmp_path):
    rng = np.random.default_rng(0)
    ref = random_dna(rng, 300)
    docs = [mutate(rng, ref, 0.02) for _ in range(3)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    ckdir = str(tmp_path / "ck")
    cfg = Config(filename=str(lst), outname=str(tmp_path / "a"),
                 backend="dense", checkpoint_dir=ckdir)
    a = compute_bwt(cfg)
    # resume: second run must reuse the checkpoint and agree byte-for-byte
    cfg2 = Config(filename=str(lst), outname=str(tmp_path / "b"),
                  backend="dense", checkpoint_dir=ckdir)
    b = compute_bwt(cfg2)
    assert (tmp_path / "a.bwt").read_bytes() == (tmp_path / "b.bwt").read_bytes()
    assert (tmp_path / "ck" / "dense_heads.npz").exists()


def test_cli_end_to_end(tmp_path):
    rng = np.random.default_rng(1)
    ref = random_dna(rng, 200)
    docs = [mutate(rng, ref, 0.02) for _ in range(2)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    out = tmp_path / "cliout"
    r = subprocess.run(
        [sys.executable, "-m", "cmsbwt_tpu", "-o", str(out), str(lst)],
        capture_output=True, text=True,
        cwd=str(tmp_path.parent),
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH":
             str(__import__("pathlib").Path(__file__).parents[1]),
             "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "cliout.bwt").exists()
    assert (tmp_path / "cliout.log").exists()


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.get("a") >= 0
    assert "a:" in t.report() and "total:" in t.report()


def test_auto_backend_resolution():
    # explicit choices pass through untouched; auto prefers the native
    # PLCP-skip engine whenever the toolchain built it (small inputs and
    # every CPU-only size), falling back to host/jump without it
    from cmsbwt_tpu.engine.pipeline import (AUTO_DENSE_MIN_CHARS,
                                            _resolve_backend)
    from cmsbwt_tpu.io.native import get_scan_lib
    native = get_scan_lib() is not None
    assert _resolve_backend("dense", 10) == "dense"
    assert _resolve_backend("host", 10**9) == "host"
    assert _resolve_backend("auto", AUTO_DENSE_MIN_CHARS - 1) == \
        ("native" if native else "host")
    assert _resolve_backend("auto", 10**9) == \
        ("native" if native else "jump")
    assert _resolve_backend("auto", None) == \
        ("native" if native else "jump")
