"""Flagship model: the CMS-BWT transform as a reusable object API.

The reference is a one-shot CLI; production deployments want to amortize the
reference index across many collections (e.g. one pangenome reference,
streams of new haplotype batches). ``CMSBWT`` holds the built index (host
and/or device) and exposes ``transform`` for repeated collections.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..config import Config
from ..engine import merge as merge_mod
from ..engine import pipeline as pipeline_mod
from ..engine.ms_host import MSArrays
from ..index.host import ReferenceIndex, build_reference_index
from ..io import fasta
from ..utils.timing import PhaseTimer


@dataclass
class TransformResult:
    bwt: bytes | None
    rle: bytes | None
    sn: int
    heads: int
    timer: PhaseTimer


class CMSBWT:
    """Reference-indexed BWT constructor for repetitive collections."""

    def __init__(self, reference: bytes | str | np.ndarray,
                 config: Optional[Config] = None):
        """``reference``: raw bytes, a FASTA/raw file path, or a pre-augmented
        uint8 array."""
        self.config = config or Config()
        if isinstance(reference, str):
            reference = fasta.load_reference_bytes(reference)
        if isinstance(reference, (bytes, bytearray)):
            self.x_aug = fasta.augment_reference(bytes(reference))
        else:
            self.x_aug = np.asarray(reference, dtype=np.uint8)
        self._host_index: Optional[ReferenceIndex] = None
        self._device_index = None

    @property
    def index(self) -> ReferenceIndex:
        if self._host_index is None:
            self._host_index = build_reference_index(self.x_aug)
        return self._host_index

    @property
    def device_index(self):
        """Device-built reference index (index/device.DeviceIndex), built
        once and reused by every jump transform."""
        if self._device_index is None:
            from ..index.device import build_device_index
            self._device_index = build_device_index(self.x_aug)
        return self._device_index

    def transform(self, collection: str | fasta.Collection,
                  rle: bool = False,
                  backend: Optional[str] = None) -> TransformResult:
        """Compute the collection BWT against the held reference."""
        cfg = self.config
        if isinstance(collection, str):
            sn_limit = fasta.collection_sn_limit(collection,
                                                 cfg.prefix_length)
            coll = fasta.parse_collection(collection, sn_limit)
        else:
            coll = collection
        fasta.validate_collection(coll)
        from ..engine.pipeline import _resolve_backend
        backend = _resolve_backend(backend or cfg.backend, len(coll.sx))
        timer = PhaseTimer()
        rle_quirk = rle and cfg.replicate_reference_rle_quirk
        buffer_bytes = cfg.buffer_gib << 30
        if backend == "dense":
            from ..ops.ms_dense import ms_dense_heads
            with timer.phase("ms_scan"):
                dres = ms_dense_heads(self.x_aug, coll.sx)
            index, heads = pipeline_mod.dense_result_to_inputs(
                self.x_aug, dres)
            result = pipeline_mod.merge_from_heads(
                index, heads, coll.d, coll.sn, rle_quirk, timer,
                buffer_bytes=buffer_bytes)
        elif backend == "jump":
            # the device reference index is cached on the model: transform
            # amortizes it across collections (the class's whole point)
            from ..ops.ms_jump import ms_jump_heads as _scan
            with timer.phase("ms_scan"):
                jres = _scan(self.x_aug, coll.sx, lanes=cfg.lanes,
                             window=cfg.skip_window,
                             index=self.device_index)
            index, heads = pipeline_mod.dense_result_to_inputs(
                self.x_aug,
                pipeline_mod.download_heads_result(jres, len(self.x_aug)))
            result = pipeline_mod.merge_from_heads(
                index, heads, coll.d, coll.sn, rle_quirk, timer,
                buffer_bytes=buffer_bytes)
        elif backend == "device":
            from ..index.device import build_device_index
            from ..ops.ms_device import ms_scan_device
            dindex = build_device_index(self.x_aug)
            index = pipeline_mod._export_device_index(dindex, self.x_aug)
            with timer.phase("ms_scan"):
                dev = ms_scan_device(dindex, coll.sx, lanes=cfg.lanes,
                                     window=cfg.skip_window)
            ms = MSArrays(pos=dev.pos, length=dev.length,
                          smaller=dev.smaller, is_head=dev.is_head)
            result = pipeline_mod.compute_bwt_arrays(
                index, coll, rle_quirk, ms=ms, timer=timer,
                buffer_bytes=buffer_bytes)
        elif backend == "native":
            # the host index is cached on the model — index-once /
            # transform-many is exactly the native engine's sweet spot
            from ..io.native import ms_scan_native
            idx = self.index
            with timer.phase("ms_scan"):
                res = ms_scan_native(
                    idx.x_padded, idx.sa, idx.isa, idx.lcp, idx.plcp,
                    idx.n, coll.sx, coll.sep_positions)
            if res is None:     # no toolchain: host spec scan
                result = pipeline_mod.compute_bwt_arrays(
                    idx, coll, rle_quirk, timer=timer,
                    buffer_bytes=buffer_bytes)
            else:
                import numpy as np
                from ..engine.heads import HeadArrays
                t, pos, ln, sml = res
                z = lambda: np.zeros(len(t), np.int64)
                char = coll.sx[(t - 1) % max(coll.sn, 1)]
                heads = HeadArrays(t=t, pos=pos, length=ln, smaller=sml,
                                   char=char, to_next=z(), isa_next=z(),
                                   succ=z(), h=len(t))
                result = pipeline_mod.merge_from_heads(
                    idx, heads, coll.d, coll.sn, rle_quirk, timer,
                    buffer_bytes=buffer_bytes)
        else:
            result = pipeline_mod.compute_bwt_arrays(
                self.index, coll, rle_quirk, timer=timer,
                buffer_bytes=buffer_bytes)
        bwt_bytes = rle_bytes = None
        with timer.phase("encode"):
            if rle:
                rle_bytes = merge_mod.runs_to_rle(result.run_len,
                                                  result.run_char)
            else:
                bwt_bytes = merge_mod.runs_to_plain(result.run_len,
                                                    result.run_char)
        return TransformResult(bwt=bwt_bytes, rle=rle_bytes, sn=result.sn,
                               heads=result.h, timer=timer)
