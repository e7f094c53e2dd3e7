"""Typed-deserialization surface: PostgreSQL text-format → Spark types.

Column-expression re-expression of the reference's serde deserializer
(/root/reference/src/deserializer.rs): values travel as wire text and are
typed lazily at the consumer's request, with PG's text-format coercions.

- ``pg_text_to_bool``: the full PG bool text set t/f/true/false/1/0/on/off/
  yes/no (case-insensitive), matching src/deserializer.rs:102-114 — wider
  than Spark's native cast (which rejects on/off).
- ``typed_columns``: strict typed projection (cast; malformed → error, via
  ANSI or null depending on session).
- ``try_typed`` + ``field_errors``: lenient mode — per-field failures yield
  type defaults plus a collected FieldError list, mirroring
  ``try_deserialize_row`` (src/deserializer.rs:1052+, defaults
  0/false/""/None).
- ``pg_timestamp``: µs since the PostgreSQL epoch (2000-01-01) → timestamp
  (src/types.rs:126-139).
- ``lsn_str``/``str_to_lsn_col``: 64-bit LSN ↔ "HI/LO" hex display form
  (src/types.rs:184-224).

All pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRUE = ("t", "true", "1", "on", "y", "yes")
_FALSE = ("f", "false", "0", "off", "n", "no")

def _default_for(ty: str) -> Column:
    if ty == "boolean":
        return F.lit(False)
    if ty == "string":
        return F.lit("")
    return F.lit(0).cast(ty)


def pg_text_to_bool(col) -> Column:
    """PG bool text coercion. Deliberately WIDER than the reference's
    parse_pg_bool (src/deserializer.rs:102-114, which accepts only t/1/f/0
    single chars and exact-lowercase true/false/on/off/yes/no): this also
    takes 'y'/'n', trims whitespace, and is case-insensitive. PostgreSQL's
    own bool input parser accepts all of these; the reference only ever
    sees the canonical 't'/'f' that PG text output emits, so the widening
    is unobservable on real CDC streams but friendlier as a standalone
    coercion utility."""
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    return (
        F.when(c.isin(*_TRUE), F.lit(True))
        .when(c.isin(*_FALSE), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


_INT_RANGES = {
    "tinyint": (-(1 << 7), (1 << 7) - 1),
    "smallint": (-(1 << 15), (1 << 15) - 1),
    "int": (-(1 << 31), (1 << 31) - 1),
    "integer": (-(1 << 31), (1 << 31) - 1),
    "bigint": None,
    "long": None,
}


def pg_int(col, ty: str = "int") -> Column:
    """Range-checked integer parse matching the reference's fast int paths
    (src/deserializer.rs:345-371 parse_signed/parse_unsigned): the token
    must be a pure optionally-signed digit string AND fit the target width
    — "1.5", "1e3" and out-of-range values yield null (the lenient surface
    turns that into default + FieldError), independent of the session's
    ANSI mode. Spark's plain cast would truncate "1.5" to 1 and its ANSI
    behavior varies by session config; this pins the reference semantics."""
    c = F.col(col) if isinstance(col, str) else col
    v = F.when(c.rlike(r"^[+-]?[0-9]+$"), c.try_cast("bigint"))
    rng = _INT_RANGES.get(ty)
    if rng is not None:
        v = F.when(v.between(rng[0], rng[1]), v)
    return v.cast("bigint" if rng is None else ty)


def pg_char(col) -> Column:
    """The reference's char deserializer (src/deserializer.rs:445-456):
    exactly one character, else null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(c) == 1, c)


def pg_enum(col, variants: list[str]) -> Column:
    """Enum-from-string (src/deserializer.rs:540-565 visit_enum analog):
    the text must be one of the declared variants, else null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isin(*variants), c)


def _cast_one(col: Column, ty: str, lenient: bool) -> Column:
    if ty == "boolean":
        return pg_text_to_bool(col)
    if lenient:
        if ty in _INT_RANGES:
            return pg_int(col, ty)
        return col.try_cast(ty)
    return col.cast(ty)


def typed_columns(df, spec: dict[str, str], source_col: str = "new_data"):
    """Strict typed projection of a map column: spec {name: spark_type}."""
    return df.select(
        *[
            _cast_one(F.element_at(source_col, n), ty, lenient=False).alias(n)
            for n, ty in spec.items()
        ]
    )


def try_typed(df, spec: dict[str, str], source_col: str = "new_data"):
    """Lenient typed projection: per-field failures substitute type defaults
    (0 / false / "" per the reference's lenient mode) and are collected into
    an ``_errors`` array<struct<field,value,message>>."""
    cols = []
    err_structs = []
    for n, ty in spec.items():
        raw = F.element_at(source_col, n)
        parsed = _cast_one(raw, ty, lenient=True)
        default = _default_for(ty)
        failed = raw.isNotNull() & parsed.isNull()
        cols.append(
            F.when(failed, default).otherwise(parsed).alias(n)
        )
        err_structs.append(
            F.when(
                failed,
                F.struct(
                    F.lit(n).alias("field"),
                    raw.alias("value"),
                    F.lit(f"invalid {ty}").alias("message"),
                ),
            )
        )
    errors = F.array_compact(F.array(*err_structs)).alias("_errors")
    return df.select(*cols, errors)


def field_errors(df):
    """Explode the lenient-mode error column into (field, value, message)."""
    return df.select(F.explode("_errors").alias("e")).select(
        "e.field", "e.value", "e.message"
    )


def pg_timestamp(col) -> Column:
    """µs since the PostgreSQL epoch (2000-01-01T00:00:00Z) → timestamp."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_micros(c + F.lit(946_684_800_000_000))


def lsn_str(col) -> Column:
    """64-bit LSN → PostgreSQL's HI/LO hex display form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat_ws(
        "/",
        F.upper(F.hex(F.shiftrightunsigned(c, 32))),
        F.upper(F.hex(c.bitwiseAND(F.lit(0xFFFFFFFF)))),
    )


def str_to_lsn_col(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    hi = F.conv(F.split(c, "/").getItem(0), 16, 10).cast("long")
    lo = F.conv(F.split(c, "/").getItem(1), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)
