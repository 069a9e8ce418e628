"""Deterministic integer fixed-point math shared by cross-engine oracles.

Any score that must hash-match between Spark and DuckDB cannot touch
libm: ``log``/``ln`` are correctly-rounded per-call but the SURROUNDING
arithmetic (sum order, intermediate precision) differs between engines.
These helpers keep everything in int64 so both engines compute the
identical bit pattern on the identical input (ORACLE_PARITY.md rule 5).

Hoisted from queries/curation_queries.py (q166/q168's CCNet surprisal)
in round 11 so operators/drift.py's PSI shares the ONE implementation.
"""

from __future__ import annotations

INTLOG2_SCALE = 1 << 20  # fixed-point log2 units: 2^-20 per step


def intlog2_fp(m_sql: str, dialect: str) -> str:
    """SQL snippet for the DETERMINISTIC integer fixed-point log2 of a
    positive integer expression ``m_sql``:

        L(m) = e * 2^20 + (m * 2^20 div 2^e) - 2^20,  e = len(bin(m)) - 1

    i.e. exact exponent plus linear interpolation of the mantissa — a
    strictly-within-octave-monotone log2 surrogate with max error ~0.086
    bits, computed with INTEGER ops only (bit-length via the binary string,
    shift, multiply, floor-div), so every engine produces the identical
    value on the identical input.  int64 headroom: m * 2^20 stays in range
    through m ~ 8.7e12 — beyond that, rescale the inputs (the same caveat
    as q120's idf units)."""
    S = INTLOG2_SCALE
    if dialect == "spark":
        return (
            f"(cast(length(bin({m_sql})) - 1 as bigint) * {S}"
            f" + (cast({m_sql} as bigint) * {S})"
            f"   div shiftleft(cast(1 as bigint), length(bin({m_sql})) - 1)"
            f" - {S})"
        )
    return (
        f"((length(bin(({m_sql})::BIGINT)) - 1)::BIGINT * {S}"
        f" + (({m_sql})::BIGINT * {S})"
        f"   // (1::BIGINT << (length(bin(({m_sql})::BIGINT)) - 1))"
        f" - {S})"
    )
