"""ASE SQLite database reader/writer (ase-free, stdlib sqlite3).

The OMat24 / OMol25 releases ship as ASE database shards consumed through
``fairchem.core.datasets.AseDBDataset`` in the reference
(ref: examples/open_materials_2024/omat24.py:96,
examples/open_molecules_2025/omol25.py — ``AseDBDataset(config=dict(
src=...))``). This module reads the underlying ASE ``systems`` table
directly: numbers/positions/cell/forces are raw little-endian blobs
(int32/float64), ``pbc`` is a 3-bit int, scalar results are REAL columns,
extra results live in the ``key_value_pairs``/``data`` JSON columns — the
documented ase.db.sqlite layout. The writer emits the same schema so
synthetic smoke runs exercise the real parser.
"""

from __future__ import annotations

import json
import os
import sqlite3
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

_COLUMNS = (
    "id INTEGER PRIMARY KEY AUTOINCREMENT, unique_id TEXT, ctime REAL, "
    "mtime REAL, username TEXT, numbers BLOB, positions BLOB, cell BLOB, "
    "pbc INTEGER, initial_magmoms BLOB, initial_charges BLOB, masses BLOB, "
    "tags BLOB, momenta BLOB, constraints TEXT, calculator TEXT, "
    "calculator_parameters TEXT, energy REAL, free_energy REAL, "
    "forces BLOB, stress BLOB, dipole BLOB, magmoms BLOB, magmom REAL, "
    "charges BLOB, key_value_pairs TEXT, data TEXT, natoms INTEGER, "
    "fmax REAL, smax REAL, volume REAL, mass REAL, charge REAL"
)


def _ints(blob: Optional[bytes], n: int) -> Optional[np.ndarray]:
    if blob is None:
        return None
    itemsize = len(blob) // max(n, 1)
    dtype = {4: "<i4", 8: "<i8"}.get(itemsize, "<i4")
    return np.frombuffer(blob, dtype=dtype, count=n).astype(np.int64)

def _floats(blob: Optional[bytes], shape) -> Optional[np.ndarray]:
    if blob is None:
        return None
    return np.frombuffer(blob, dtype="<f8").reshape(shape).copy()


def read_ase_sqlite(
    path: str, limit: Optional[int] = None
) -> Iterator[Dict[str, Any]]:
    """Yield records {numbers, positions, cell, pbc, energy, forces,
    key_value_pairs, data} from an ASE .db / .aselmdb-sibling sqlite file."""
    con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)
    try:
        cur = con.execute(
            "SELECT numbers, positions, cell, pbc, energy, forces, "
            "key_value_pairs, data, natoms FROM systems"
            + (f" LIMIT {int(limit)}" if limit else "")
        )
        for (numbers, positions, cell, pbc, energy, forces, kvp, data,
             natoms) in cur:
            if natoms:
                n = int(natoms)
            elif positions:
                # positions are always float64 xyz triplets: 24 bytes/atom
                n = len(positions) // 24
            elif forces:
                # definitive: forces are always float64 xyz triplets
                # (24 bytes/atom) — disambiguates the numbers dtype exactly
                # (the blob-size heuristic below misreads an int32 blob with
                # an even atom count as int64, halving the count)
                n = len(forces) // 24
            else:
                # last resort. ASE on 64-bit Linux stores numbers as int64;
                # older dumps (and our writer, which always records natoms)
                # use int32 — disambiguate by blob size
                n = (
                    0 if not numbers
                    else len(numbers) // 8 if len(numbers) % 8 == 0
                    else len(numbers) // 4
                )
            rec: Dict[str, Any] = {
                "numbers": _ints(numbers, n),
                "positions": _floats(positions, (n, 3)),
                "cell": _floats(cell, (3, 3)),
                "pbc": np.array(
                    [bool(int(pbc or 0) >> b & 1) for b in range(3)]
                ),
                "energy": energy,
                "forces": _floats(forces, (n, 3)),
                "key_value_pairs": json.loads(kvp) if kvp else {},
                "data": json.loads(data) if data else {},
            }
            yield rec
    finally:
        con.close()


def write_ase_sqlite(path: str, records: List[Dict[str, Any]]) -> str:
    """Write records in the ASE sqlite ``systems`` schema (for smoke data
    and round-trip tests)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if os.path.exists(path):
        os.remove(path)
    con = sqlite3.connect(path)
    con.execute(f"CREATE TABLE systems ({_COLUMNS})")
    con.execute(
        "CREATE TABLE information (name TEXT, value TEXT)"
    )
    con.execute(
        "INSERT INTO information VALUES ('version', '9')"
    )
    for rec in records:
        numbers = np.asarray(rec["numbers"], np.int32)
        pos = np.asarray(rec["positions"], np.float64)
        n = len(numbers)
        cell = rec.get("cell")
        pbc_arr = rec.get("pbc")
        pbc = 0
        if pbc_arr is not None:
            for b in range(3):
                pbc |= int(bool(np.asarray(pbc_arr).ravel()[b])) << b
        forces = rec.get("forces")
        con.execute(
            "INSERT INTO systems (numbers, positions, cell, pbc, energy, "
            "forces, key_value_pairs, data, natoms) "
            "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (
                numbers.astype("<i4").tobytes(),
                pos.astype("<f8").tobytes(),
                None if cell is None
                else np.asarray(cell, "<f8").tobytes(),
                pbc,
                None if rec.get("energy") is None
                else float(rec["energy"]),
                None if forces is None
                else np.asarray(forces, "<f8").tobytes(),
                json.dumps(rec.get("key_value_pairs", {})),
                json.dumps(rec.get("data", {})),
                n,
            ),
        )
    con.commit()
    con.close()
    return path
