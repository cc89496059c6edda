"""Worker for tests/test_distributed_2proc.py: one of two cooperating
processes running the mesh scan + sharded merge over a jax.distributed
CPU cluster (4 virtual devices per process -> one 8-device global mesh).

Inputs are regenerated deterministically in every process (multi-host
convention: each process feeds identical host data; jax.device_put with a
global NamedSharding ships each process's addressable shards). Process 0
writes the merged run list for the test to compare byte-for-byte against
the single-process engine."""
import os
import pathlib
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = pathlib.Path(sys.argv[3])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
repo = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(repo))
sys.path.insert(0, str(repo / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from cmsbwt_tpu.parallel.distributed import (is_primary,  # noqa: E402
                                             maybe_initialize)

assert maybe_initialize(f"localhost:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4

from cmsbwt_tpu.io import fasta  # noqa: E402
from cmsbwt_tpu.io.fasta import augment_reference  # noqa: E402
from cmsbwt_tpu.parallel.mesh import make_mesh, ms_dense_heads_mesh  # noqa
from cmsbwt_tpu.parallel.sharded_merge import merge_heads_sharded  # noqa

from helpers import make_fasta, mutate, random_dna  # noqa: E402

rng = np.random.default_rng(7)
ref = random_dna(rng, 600)
docs = [mutate(rng, ref, 0.03) for _ in range(4)]
x_aug = augment_reference(ref)
coll_path = outdir / f"coll_{pid}.fa"
coll_path.write_bytes(make_fasta(docs))
coll = fasta.parse_collection(str(coll_path), 2**64 - 1)

# mesh scan across the process boundary: 8 blocks over the 8-device
# global mesh (the ppermute chain crosses between the two processes)
dres = ms_dense_heads_mesh(x_aug, coll.sx, block_chars=400,
                           mesh=make_mesh())

# sharded merge across the boundary (every dsort's bucket exchange is an
# inter-process all-to-all here)
rl, rc = merge_heads_sharded(
    dres.head_t, dres.head_pos, dres.head_len, dres.head_smaller,
    dres.head_char, dres.ref_sa, dres.ref_isa, dres.ref_bwt,
    dres.h, len(x_aug), dres.sn, coll.d, rle_quirk=False)

if is_primary():
    np.savez(outdir / "result.npz", rl=rl, rc=rc, h=np.int64(dres.h))
print(f"worker {pid} done h={dres.h} runs={len(rl)}", flush=True)
