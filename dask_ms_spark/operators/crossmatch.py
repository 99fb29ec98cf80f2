"""Sky-catalog cross-matching — the astronomy join the MS data model
feeds downstream (source association across epochs/bands).

Implements the Zones algorithm (Gray, Nieto-Santisteban & Szalay,
"The Zones Algorithm for Finding Points-Near-a-Point or
Cross-Matching Spatial Datasets", MSR-TR-2006-52 — public): declination
is striped into zones of height >= the match radius and right
ascension into blocks wide enough at the worst-case declination, so
the candidate join touches only the 3x3 neighbouring (zone, block)
cells of each probe point.  The exact angular separation (haversine)
then filters candidates — the bucketing is pure pruning, so results
are EXACTLY the all-pairs answer.

Scale shape: one side explodes to its 9 neighbouring cells (tiny
constant fan-out), the join is cell-keyed (bucket-local, never
all-pairs), and the per-pair trig runs in whole-stage codegen.  At
100 TB of catalog this is the standard spatial-join layout; skewed
cells (dense sky regions) are the one hazard, bounded upstream by the
same salting/bucket-cap patterns as the LSH family.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["angular_sep_deg", "crossmatch_sky"]


def angular_sep_deg(ra1, dec1, ra2, dec2):
    """Great-circle separation in degrees via the haversine form
    (numerically stable at small separations, where the spherical
    cosine rule loses all precision).  Inputs in degrees."""
    dd = F.radians(dec2 - dec1) / 2
    dr = F.radians(ra2 - ra1) / 2
    a = (F.sin(dd) * F.sin(dd)
         + F.cos(F.radians(dec1)) * F.cos(F.radians(dec2))
         * F.sin(dr) * F.sin(dr))
    return F.degrees(F.lit(2.0) * F.asin(F.sqrt(a)))


def crossmatch_sky(left: DataFrame, right: DataFrame,
                   radius_deg: float,
                   left_id: str = "id", right_id: str = "id",
                   ra_col: str = "ra", dec_col: str = "dec",
                   max_abs_dec: float = 89.0,
                   nearest: bool = False) -> DataFrame:
    """All pairs (or nearest match) within ``radius_deg`` between two
    (id, ra, dec) catalogs; coordinates in degrees, ra in [0, 360).

    Zones: dec stripes of height ``radius_deg``; ra blocks of width
    ``radius_deg / cos(max_abs_dec + radius_deg)`` so a block is wide
    enough at the most compressed declination in play (rows beyond
    ``max_abs_dec`` raise rather than silently losing matches — raise
    it toward the pole at the cost of wider blocks; polar caps want
    the dedicated small-cap scan the Zones paper describes).  The
    right catalog explodes to its 3x3 neighbouring cells with ra
    wrap-around handled modulo the block count; the left side is
    keyed by its own cell only.  Exact haversine filters candidates,
    so the output is identical to the all-pairs spelling.

    ``nearest=True`` keeps only each left row's closest match
    (ties break by right id).  Returns (left_id, right_id, sep_deg).
    """
    if radius_deg <= 0:
        raise ValueError(f"crossmatch_sky: radius_deg must be > 0, "
                         f"got {radius_deg}")
    if max_abs_dec + radius_deg >= 90:
        raise ValueError("crossmatch_sky: max_abs_dec + radius_deg "
                         "must stay below the pole (90 deg); polar "
                         "caps need a dedicated cap scan")
    # Zone height carries a relative safety margin: two points whose
    # FLOAT separation passes `sep <= radius` can sit a hair more
    # than `radius` apart in exact dec (rounding in the haversine),
    # and with height == radius exactly, boundary-sitting points that
    # far apart land TWO zones apart (found by the hypothesis
    # all-pairs property test: dec 0.5 vs -2e-308 at radius 0.5).
    # 1e-9 relative is >> any double rounding at these magnitudes and
    # << a zone, so pruning stays tight.
    height = radius_deg * (1.0 + 1e-9)
    # Block width gets the same relative margin as zone height, and
    # n_blocks uses FLOOR so the realised width 360/n_blocks is at
    # least the worst-case RA separation.  ceil would make blocks
    # NARROWER than required (e.g. radius=1, max_abs_dec=0.5: worst
    # dRA 1.0000381 deg vs 360/360 = 1.0 deg exactly), silently
    # dropping a pair that lands two blocks apart.
    width = (radius_deg / math.cos(math.radians(max_abs_dec + radius_deg))
             * (1.0 + 1e-9))
    n_blocks = max(1, int(math.floor(360.0 / width)))

    def dec_guarded(dec):
        # folded into the zone expression so column pruning can never
        # drop the check (the repo's raise-through-expression rule)
        return F.when(F.abs(dec) > max_abs_dec, F.raise_error(F.lit(
            "crossmatch_sky: |dec| exceeds max_abs_dec — raise "
            "max_abs_dec or route polar rows to a cap scan"))) \
            .otherwise(dec)

    def zone_of(dec):
        return (F.floor(dec_guarded(dec) / F.lit(float(height)))
                .cast("long"))

    def block_of(ra):
        return (F.floor(ra / F.lit(360.0) * n_blocks).cast("long")
                % n_blocks)

    l = left.select(F.col(left_id).alias("left_id"),
                    F.col(ra_col).cast("double").alias("__ra"),
                    F.col(dec_col).cast("double").alias("__dec")) \
        .select("left_id", "__ra", "__dec",
                zone_of(F.col("__dec")).alias("zone"),
                block_of(F.col("__ra")).alias("blk"))

    neigh = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    r = right.select(F.col(right_id).alias("right_id"),
                     F.col(ra_col).cast("double").alias("__ra2"),
                     F.col(dec_col).cast("double").alias("__dec2")) \
        .select("right_id", "__ra2", "__dec2",
                zone_of(F.col("__dec2")).alias("__z0"),
                block_of(F.col("__ra2")).alias("__b0")) \
        .select("right_id", "__ra2", "__dec2", "__z0", "__b0",
                F.explode(neigh).alias("__dz")) \
        .select("right_id", "__ra2", "__dec2", "__b0",
                (F.col("__z0") + F.col("__dz")).alias("zone"),
                F.explode(neigh).alias("__db")) \
        .select("right_id", "__ra2", "__dec2", "zone",
                ((F.col("__b0") + F.col("__db") + n_blocks) % n_blocks)
                .alias("blk"))

    sep = angular_sep_deg(F.col("__ra"), F.col("__dec"),
                          F.col("__ra2"), F.col("__dec2"))
    pairs = (l.join(r, on=["zone", "blk"])
             .select("left_id", "right_id", sep.alias("sep_deg"))
             .where(F.col("sep_deg") <= radius_deg)
             .dropDuplicates(["left_id", "right_id"]))
    if not nearest:
        return pairs
    w = Window.partitionBy("left_id").orderBy(
        F.col("sep_deg").asc(), F.col("right_id").asc())
    return (pairs.withColumn("__rn", F.row_number().over(w))
                 .where(F.col("__rn") == 1).drop("__rn"))
