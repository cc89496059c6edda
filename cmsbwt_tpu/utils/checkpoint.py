"""Phase-boundary checkpoint/resume (SURVEY.md §5).

The reference has no crash recovery — its only persistence is the
``.phrases`` spill file (ref CMS-BWT-functions.cpp:1135-1416) which bounds
RAM, not failures. Here each expensive phase (reference index, head
records) can be serialized after completion and reloaded on restart; a
fingerprint of the inputs and the relevant config guards staleness.
"""
from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import numpy as np


class CheckpointManager:
    def __init__(self, directory: Optional[str]):
        self.dir = directory
        if directory:
            os.makedirs(directory, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.dir, f"{name}.npz")

    @staticmethod
    def fingerprint(**parts) -> str:
        blob = json.dumps(parts, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]

    def save(self, name: str, fingerprint: str, arrays: dict) -> None:
        if not self.dir:
            return
        tmp = os.path.join(self.dir, f"{name}.tmp.npz")
        with open(tmp, "wb") as f:
            np.savez(f, __fingerprint__=np.frombuffer(
                fingerprint.encode(), dtype=np.uint8), **arrays)
        os.replace(tmp, self._path(name))

    def load(self, name: str, fingerprint: str) -> Optional[dict]:
        if not self.dir or not os.path.exists(self._path(name)):
            return None
        try:
            data = np.load(self._path(name))
        except Exception:
            return None
        fp = bytes(data["__fingerprint__"]).decode()
        if fp != fingerprint:
            return None
        return {k: data[k] for k in data.files if k != "__fingerprint__"}


def file_stamp(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size,
            "mtime": int(st.st_mtime)}
