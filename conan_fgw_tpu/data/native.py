"""ctypes binding for the native C++ batch packer (with lazy build).

The shared library is compiled on first use with the system ``g++`` into the
package directory; if no toolchain is available the caller falls back to the
pure-Python packer in ``conan_fgw_tpu.data.packing``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Sequence

import numpy as np

from conan_fgw_tpu.data.packing import DEFAULT_BUCKETS, MoleculeRecord, PackedBatch, bucket_for
from conan_fgw_tpu.data.vocab import NUM_ATOM_FEATURES, NUM_BOND_FEATURES

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "packer.cpp")
_LIB_PATH = os.path.join(_HERE, "..", "native", "_packer.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
            lib.pack_batch.argtypes = (
                [ctypes.c_int32] * 6
                + [i32p, f32p, i32p, i32p, f32p, i32p, i32p, f32p]
                + [i32p, f32p, u8p, i32p, u8p, f32p, f32p, u8p]
            )
            lib.pack_batch.restype = None
            _lib = lib
        except Exception:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


def pack_batch_native(
    records: Sequence[MoleculeRecord],
    *,
    max_atoms: int | None = None,
    batch_size: int | None = None,
    buckets=DEFAULT_BUCKETS,
) -> PackedBatch:
    """Drop-in replacement for ``packing.pack_batch`` using the C++ kernel."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native packer unavailable (no g++?)")
    if not records:
        raise ValueError("empty batch")
    K = records[0].num_conformers
    n_max = max(r.num_atoms for r in records)
    N = max_atoms if max_atoms is not None else bucket_for(n_max, buckets)
    if n_max > N:
        raise ValueError(f"molecule with {n_max} atoms does not fit max_atoms={N}")
    B = batch_size if batch_size is not None else len(records)
    B_real = len(records)
    if B_real > B:
        raise ValueError("more records than batch_size")
    for r in records:
        if r.num_conformers != K:
            raise ValueError("all molecules in a batch must share K")

    z_c = np.ascontiguousarray(np.concatenate([r.z for r in records]), np.int32)
    # per-record (K, n, 3) flattened in record order
    pos_c = np.ascontiguousarray(
        np.concatenate([r.pos.reshape(-1) for r in records]), np.float32
    )
    x2d_c = np.ascontiguousarray(
        np.concatenate([r.x2d.reshape(-1) for r in records]), np.int32
    )
    bonds_c = np.ascontiguousarray(
        np.concatenate([r.bonds.reshape(-1) for r in records] or [np.zeros(0, np.int32)]),
        np.int32,
    )
    battr_c = np.ascontiguousarray(
        np.concatenate([r.bond_attr.reshape(-1) for r in records] or [np.zeros(0, np.float32)]),
        np.float32,
    )
    n_atoms = np.asarray([r.num_atoms for r in records], np.int32)
    n_bonds = np.asarray([len(r.bonds) for r in records], np.int32)
    y = np.asarray([r.y for r in records], np.float32)

    z = np.zeros((B, K, N), np.int32)
    pos = np.zeros((B, K, N, 3), np.float32)
    atom_mask = np.zeros((B, N), np.uint8)
    x2d = np.zeros((B, N, NUM_ATOM_FEATURES), np.int32)
    bond_adj = np.zeros((B, N, N), np.uint8)
    bond_attr = np.zeros((B, N, N, NUM_BOND_FEATURES), np.float32)
    y_out = np.zeros((B,), np.float32)
    mol_mask = np.zeros((B,), np.uint8)

    lib.pack_batch(
        B_real, B, K, N, NUM_ATOM_FEATURES, NUM_BOND_FEATURES,
        z_c, pos_c, x2d_c, bonds_c, battr_c, n_atoms, n_bonds, y,
        z.reshape(-1), pos.reshape(-1), atom_mask.reshape(-1), x2d.reshape(-1),
        bond_adj.reshape(-1), bond_attr.reshape(-1), y_out, mol_mask,
    )
    return PackedBatch(
        z=z, pos=pos, atom_mask=atom_mask.astype(bool), x2d=x2d,
        bond_adj=bond_adj.astype(bool), bond_attr=bond_attr, y=y_out,
        mol_mask=mol_mask.astype(bool),
    )
