"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
``ray.init``/``ray.shutdown`` here or in the library code these
callables use.

- ``entry()``    — flagship image label-job pipeline at sf0.001 scale
  (the input_hint-shaped images table is synthesized deterministically
  under /tmp, seed=42; no external data).
- ``queries()``  — one entry per implemented operator/pipeline
  (SURVEY.md §2 + training-data extras), each taking ``sf_dir``.
- ``oracle_sql()`` — DuckDB twins for the SQL-expressible subset;
  integer/dyadic-exact arithmetic throughout so value hashes match
  bit-for-bit (see osmray/queries.py module docstring).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from osmray import queries as Q


def entry() -> Any:
    """Flagship: read -> decode -> tile/cell assign -> feature join ->
    mask rasterize -> labeled output, at sf0.001 scale."""
    return Q.q_image_label_job("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in Q.registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in Q.registry().items() if sql is not None}
