"""Registry for persisted intermediate relations.

Query builders persist small control-flow relations (lattice cells, generated
page fixtures) that feed two consumers inside one plan.  In a long-lived
driver session those caches would otherwise accumulate (ADVICE r2:
``extract_tables_relational`` and the fixture ``pages`` persists were never
unpersisted by any caller).  Builders register their persists here; the
harness wrapper releases all leftovers at the start of the NEXT query build,
after the previous result has been materialized — unpersist is always safe
(a released relation recomputes, never corrupts), so the ordering is a
performance contract only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and track it for a later :func:`release`."""
    df.persist()
    _LIVE.append(df)
    return df


def release() -> None:
    """Unpersist every tracked relation (non-blocking)."""
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
        except Exception:
            pass  # session gone / already unpersisted — nothing to free
