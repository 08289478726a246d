"""Salted equi-join — the manual skew mitigation for fact⋈fact joins
where one side's key distribution is pathological and AQE's runtime
skew-split cannot help (e.g. a SINGLE key holding >1 partition's worth
of rows on BOTH sides, or a sort-merge join forced by memory limits).

Mechanics: the probe side appends a deterministic salt ∈ [0, S) derived
from a high-entropy row attribute, the build side replicates each row S
times (one per salt value), and the join key becomes (key, salt) — so
one hot key's rows spread across S reducers instead of one. Replication
multiplies the build side by S: salt ONLY when the build side is small
relative to the hot key's row count, and prefer broadcast/AQE when they
apply (this operator is the fallback, not the default — see SCALE.md
joins notes).

Semantics are EXACTLY those of the plain equi-join — every probe row
meets every build row of its key exactly once (each probe row carries
ONE salt; the build side has exactly one replica per salt) — which is
what the oracle-certified workload (`join_salted_user_enrich`) proves
by hash against the unsalted SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_equi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_src,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `probe` to `build` on `key` with an S-way salt.

    ``salt_src`` is a Column expression over `probe` rows with enough
    entropy to spread a hot key (an id column, xxhash64 of the row —
    NOT the join key itself, which is constant within the hot key).
    A NULL salt_src lands in slot 0 (coalesced) rather than silently
    dropping the row — pmod(NULL, S) matches no replica. The salt is
    deterministic (``pmod(salt_src, S)``) so retries and oracles
    reproduce the same placement. Build-side replication uses
    ``explode(sequence(...))`` — S small integers per row, no data
    copies until after the shuffle boundary where they are needed.

    Probe-preserving modes only: inner/left/semi/anti keep plain-join
    semantics because every build key carries exactly one replica per
    salt; RIGHT/FULL OUTER would emit an unmatched build row once PER
    REPLICA (S copies) and are rejected.
    """
    probe_preserving = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti",
    }
    if how.lower() not in probe_preserving:
        raise ValueError(
            f"salted_equi_join: how={how!r} is not probe-preserving — an "
            f"unmatched build row would surface once per salt replica. "
            f"Use the plain join (or AQE skew handling) for right/full outer."
        )
    clash = [c for c in ("_salt",) if c in probe.columns or c in build.columns]
    if clash:
        raise ValueError(
            f"salted_equi_join: input already carries helper column(s) {clash}; "
            f"rename them first — silently overwriting would change results."
        )
    salt = F.pmod(F.coalesce(salt_src, F.lit(0)), F.lit(n_salts)).cast("int")
    p = probe.withColumn("_salt", salt)
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")
