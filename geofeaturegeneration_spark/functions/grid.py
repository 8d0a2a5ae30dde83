"""Grid / Cantor-pairing expressions.

The reference computes these row-at-a-time in Python
(``CommonCode.py:80-143``, applied via ``df.apply(axis=1)`` at e.g.
``GenerateGeographicFeature.py:209`` and ``AttachFeature.py:277``) — its
single biggest hot-path defect. Here every function returns a pure Spark
Column expression, so the whole thing stays inside whole-stage codegen and
costs one projection.

Semantics matched exactly:

* sign fold (``CommonCode.py:86-95``): ``x >= 0 → 2x`` else ``2|x| - 1``;
  the reference added this fold after discovering negative ``loncol`` values
  (bug ledger ``Record.md:11-23``).
* Cantor pair (``CommonCode.py:97-100``): ``(fx+fy)(fx+fy+1)//2 + fy``.
* inverse (``CommonCode.py:102-131``): ``w = floor((sqrt(8z+1)-1)/2)``,
  ``t = w(w+1)/2``, ``y = z - t``, ``x = w - y``, then sign unfold.
* affine cell assignment (``Test/GeoFeatureGenerationClass.py:243-253``,
  θ=0 rect method): ``loncol = floor((lon - slon + deltalon/2) / deltalon)``.
* cell centre (tbd ``grid_to_centre``, used at
  ``GenerateGeographicFeature.py:237``): ``slon + loncol * deltalon``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold(c: Column) -> Column:
    """Z → N sign fold: non-negative → 2x, negative → 2|x|-1."""
    c = c.cast("long")
    return F.when(c >= 0, c * 2).otherwise(-c * 2 - 1)


def _unfold(c: Column) -> Column:
    """Inverse of _fold: even → x/2, odd → -(x+1)/2."""
    return F.when(c % 2 == 0, (c / 2).cast("long")).otherwise(
        (-(c + 1) / 2).cast("long")
    )


def cantor_pair(x: Column, y: Column) -> Column:
    """Sign-folded Cantor pairing (CommonCode.py:80-100) as a column expr.

    For this engine's grids (|loncol| ≤ ~2150, |latcol| ≤ ~1180 per the
    reference bounds) the result fits easily in int64; the expression is
    int64-safe up to folded sums ~3e9.
    """
    fx, fy = _fold(x), _fold(y)
    s = fx + fy
    return ((s * (s + 1)) / 2).cast("long") + fy


def cantor_unpair_x(z: Column) -> Column:
    """First component of the Cantor inverse (CommonCode.py:102-131)."""
    z = z.cast("long")
    w = F.floor((F.sqrt(z * 8 + 1) - 1) / 2).cast("long")
    t = ((w * (w + 1)) / 2).cast("long")
    fy = z - t
    fx = w - fy
    return _unfold(fx)


def cantor_unpair_y(z: Column) -> Column:
    """Second component of the Cantor inverse."""
    z = z.cast("long")
    w = F.floor((F.sqrt(z * 8 + 1) - 1) / 2).cast("long")
    t = ((w * (w + 1)) / 2).cast("long")
    fy = z - t
    return _unfold(fy)


def gps_to_loncol(lon: Column, params: dict) -> Column:
    """Affine lon → cell column (Test/GeoFeatureGenerationClass.py:243-253, θ=0)."""
    return F.floor(
        (lon - params["slon"] + params["deltalon"] / 2) / params["deltalon"]
    ).cast("long")


def gps_to_latcol(lat: Column, params: dict) -> Column:
    return F.floor(
        (lat - params["slat"] + params["deltalat"] / 2) / params["deltalat"]
    ).cast("long")


def grid_to_centre_lon(loncol: Column, params: dict) -> Column:
    """Cell column → centre longitude (GenerateGeographicFeature.py:226-240)."""
    return (loncol * params["deltalon"] + params["slon"]).cast("double")


def grid_to_centre_lat(latcol: Column, params: dict) -> Column:
    return (latcol * params["deltalat"] + params["slat"]).cast("double")


def in_bounds(lon: Column, lat: Column, bounds) -> Column:
    """Strict 4-way range predicate — MUST be strict ``<`` / ``>`` to match
    tbd.clean_outofbounds (Test/GeoFeatureGenerationClass.py:339-340)."""
    lon1, lat1, lon2, lat2 = bounds
    return (lon > lon1) & (lon < lon2) & (lat > lat1) & (lat < lat2)


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Standard geohash (base-32, interleaved lon/lat bits, lon first) as a
    pure column expression — the reference's Foursquare venue bucketing
    (PreviousVersion/UseFoursquare.ipynb cell 11 ``geohash.encode``).

    The binary-search refinement is equivalent to quantizing each axis to
    its bit budget (lon gets ceil(5p/2) bits, lat floor(5p/2)) and
    interleaving: global bit i (MSB-first) is a lon bit for even i, lat for
    odd. All integer shifts/masks — any engine reproduces it bit-exactly
    (DuckDB oracle mirror in __spark_entry__; the oracle keeps the
    per-bit formulation, the values are what must agree). Out-of-range
    coordinates are clamped to the valid cell like the reference
    implementations.

    Column-expression form: linear per-bit extraction with a substr lookup
    on a literal alphabet (no per-row CreateArray). Fine for unit tests and
    one-off use; the contract/scale path is ``with_geohash`` below, whose
    staged intermediate columns keep the codegen tree small (an inline
    O(log b) magic-mask spread is NOT usable here — each level references
    its input twice, so a pure expression tree duplicates the whole
    upstream subtree 2^5 times and planning/codegen dominates runtime)."""
    n_bits = 5 * precision
    b_lon = (n_bits + 1) // 2
    b_lat = n_bits // 2

    def quant(v: Column, lo: float, hi: float, b: int) -> Column:
        q = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << b)))
        return F.greatest(
            F.lit(0).cast("long"),
            F.least(q.cast("long"), F.lit((1 << b) - 1)),
        )

    lon_q = quant(lon, -180.0, 180.0, b_lon)
    lat_q = quant(lat, -90.0, 90.0, b_lat)

    def bit_at(i: int) -> Column:
        # global bit i, MSB-first: even -> lon, odd -> lat
        if i % 2 == 0:
            return F.shiftright(lon_q, b_lon - 1 - i // 2).bitwiseAND(F.lit(1))
        return F.shiftright(lat_q, b_lat - 1 - i // 2).bitwiseAND(F.lit(1))

    chars = []
    for k in range(precision):
        idx = F.lit(0).cast("long")
        for j in range(5):
            idx = idx + F.shiftleft(bit_at(5 * k + j), 4 - j)
        chars.append(
            F.substr(F.lit(GEOHASH_ALPHABET), (idx + 1).cast("int"), F.lit(1))
        )
    # NULL coordinates must yield NULL, not a legitimate-looking corner
    # hash: Spark's greatest/least SKIP nulls, so the clamp would otherwise
    # turn a null quantized value into the all-ones cell ('zzz...'), while
    # SQL engines whose least/greatest propagate NULL (DuckDB) return NULL.
    return F.when(
        lat.isNull() | lon.isNull(), F.lit(None).cast("string")
    ).otherwise(F.concat(*chars))


def with_geohash(
    df,
    lat: Column,
    lon: Column,
    outputs: dict[str, int],
):
    """Scale path for geohash: add one base-32 geohash column per
    ``{output_name: precision}`` entry using the O(log b) magic-mask bit
    interleave, STAGED as intermediate DataFrame columns.

    Staging is the point, not a convenience: each spread level computes
    ``x | x<<sh & mask`` — referencing its input twice — so inlined into a
    single Column expression the upstream subtree doubles per level (2^5x)
    and Catalyst planning + Janino codegen dominate wall time (measured:
    the inline form was 4x SLOWER end-to-end than the naive 150-node
    per-bit form purely on plan/compile cost). As withColumn aliases the
    duplication is bounded: CollapseProject declines to inline a non-cheap
    alias referenced more than once, so every level stays a 3-op
    projection and whole-stage codegen names it once. Same bit semantics
    as ``geohash_encode`` (shared quantization; NULL coords -> NULL hash).
    """
    spreads = (
        (16, 0x0000FFFF0000FFFF),
        (8, 0x00FF00FF00FF00FF),
        (4, 0x0F0F0F0F0F0F0F0F),
        (2, 0x3333333333333333),
        (1, 0x5555555555555555),
    )

    def quant(v: Column, lo: float, hi: float, b: int) -> Column:
        q = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(1 << b)))
        return F.greatest(
            F.lit(0).cast("long"),
            F.least(q.cast("long"), F.lit((1 << b) - 1)),
        )

    tmp: list[str] = []
    for out, precision in outputs.items():
        n_bits = 5 * precision
        b_lon = (n_bits + 1) // 2
        b_lat = n_bits // 2
        lon_c, lat_c = f"_ghq_lon_{out}", f"_ghq_lat_{out}"
        tmp += [lon_c, lat_c]
        df = df.withColumn(lon_c, quant(lon, -180.0, 180.0, b_lon))
        df = df.withColumn(lat_c, quant(lat, -90.0, 90.0, b_lat))
        for sh, mask in spreads:
            for c in (lon_c, lat_c):
                df = df.withColumn(
                    c,
                    F.col(c)
                    .bitwiseOR(F.shiftleft(F.col(c), sh))
                    .bitwiseAND(F.lit(mask)),
                )
        # MSB-first global bit i sits at LSB position n_bits-1-i; lon owns
        # even i, so lon lands on even LSB positions iff n_bits is odd
        g_c = f"_ghg_{out}"
        tmp.append(g_c)
        if n_bits % 2:
            g = F.col(lon_c).bitwiseOR(F.shiftleft(F.col(lat_c), 1))
        else:
            g = F.col(lat_c).bitwiseOR(F.shiftleft(F.col(lon_c), 1))
        df = df.withColumn(g_c, g)
        chars = [
            F.substr(
                F.lit(GEOHASH_ALPHABET),
                (
                    F.shiftright(F.col(g_c), 5 * (precision - 1 - k))
                    .bitwiseAND(F.lit(31))
                    + 1
                ).cast("int"),
                F.lit(1),
            )
            for k in range(precision)
        ]
        df = df.withColumn(
            out,
            F.when(
                lat.isNull() | lon.isNull(), F.lit(None).cast("string")
            ).otherwise(F.concat(*chars)),
        )
    return df.drop(*tmp)
