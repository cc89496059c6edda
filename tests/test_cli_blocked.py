"""CLI blocked-mode parity with the reference binary."""
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from helpers import make_inputs, mutate, random_dna

REPO = pathlib.Path(__file__).resolve().parent.parent
REF_BIN = REPO / "baseline" / "cms-bwt-ref"


def test_cli_block_chars_matches_reference(tmp_path):
    if not REF_BIN.exists():
        r = subprocess.run([str(REPO / "baseline" / "build.sh")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("reference build failed")
    rng = np.random.default_rng(0)
    ref = random_dna(rng, 600)
    docs = [mutate(rng, ref, 0.01) for _ in range(4)]
    lst, _, _ = make_inputs(tmp_path, ref, docs)
    subprocess.run([str(REF_BIN), "-o", str(tmp_path / "ref"), str(lst)],
                   check=True, capture_output=True)
    env = {"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO),
           "JAX_PLATFORMS": "cpu"}
    r = subprocess.run(
        [sys.executable, "-m", "cmsbwt_tpu", "--backend", "dense",
         "--block-chars", "700", "-o", str(tmp_path / "ours"), str(lst)],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "ours.bwt").read_bytes() == \
        (tmp_path / "ref.bwt").read_bytes()
