"""Scalar transform ops (T1-T6) — the per-column ``transform:``
mini-language, compiled to Column expressions.

Reference dispatch loop: ``/root/reference/plugins/default_transform.py:18-39``;
ops compose left-to-right from a comma-separated list
(``/root/reference/mappings/parser.py:71-75``). Implemented surface =
shipped ops (strip/upper/lower/to_bool/insert) ∪ ops declared in the
shipped example config but unimplemented there (to_int, trim, capitalize,
to_date — ``/root/reference/config/tables/table_example.yaml:30,38,54``,
SURVEY.md §2.6).

Semantics notes (deliberate, documented deviations from row-Python):

* String ops apply only when the column is a string — the reference
  checks ``isinstance(val, str)`` per row; a Spark column has one static
  type, so the compiler skips string-only ops on non-string columns
  (flagged via ``_string_only``).
* ``to_bool`` — the reference maps 'N'/0→False, 'Y'/1→True and leaves
  anything else *unchanged*, which is untypeable in a static column.
  Here unmatched values become NULL BooleanType (documented deviation;
  also accepts lowercase y/n and 'true'/'false'/'0'/'1' strings).
  The reference triggers this op for ANY op name containing "true"/"false"
  (string hack at ``default_transform.py:26``); the compiler reproduces
  the *intent* by routing such names here (SURVEY.md §7.4.10).
* Ops take ``(col, arg)`` where ``arg`` is the text after ``:`` in the op
  token (e.g. ``insert:ACTIVE`` → arg="ACTIVE").

Everything here is a built-in JVM-side function — no Python UDFs, so the
whole chain stays inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..registry import register


def _string_only(fn):
    fn._string_only = True
    return fn


@register("transform_op", "strip")
@register("transform_op", "trim")
@_string_only
def op_strip(col: Column, arg: str | None = None) -> Column:
    """T1 ``strip`` (and declared alias ``trim``): str.strip() ≈ F.trim.
    Ref: ``default_transform.py:20-21``."""
    return F.trim(col)


@register("transform_op", "upper")
@_string_only
def op_upper(col: Column, arg: str | None = None) -> Column:
    """T2. Ref: ``default_transform.py:22-23``."""
    return F.upper(col)


@register("transform_op", "lower")
@_string_only
def op_lower(col: Column, arg: str | None = None) -> Column:
    """T3. Ref: ``default_transform.py:24-25``."""
    return F.lower(col)


@register("transform_op", "capitalize")
@_string_only
def op_capitalize(col: Column, arg: str | None = None) -> Column:
    """Declared-but-unimplemented in reference
    (``table_example.yaml:38``); intended for person names → initcap."""
    return F.initcap(col)


@register("transform_op", "to_bool")
def op_to_bool(col: Column, arg: str | None = None) -> Column:
    """T4 Y/N/1/0 → boolean. Ref: ``default_transform.py:26-32``;
    unmatched → NULL (see module docstring)."""
    s = F.upper(F.trim(col.cast("string")))
    return (
        F.when(s.isin("Y", "1", "TRUE", "T"), F.lit(True))
        .when(s.isin("N", "0", "FALSE", "F"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


@register("transform_op", "insert")
def op_insert(col: Column, arg: str | None = None) -> Column:
    """T5 ``insert:<v>`` constant overwrite; ``insert:null`` → NULL.
    Ref: ``default_transform.py:33-37``."""
    if arg is None or arg == "null":
        return F.lit(None).cast("string")
    return F.lit(arg)


@register("transform_op", "to_int")
def op_to_int(col: Column, arg: str | None = None) -> Column:
    """Declared (``table_example.yaml:30``). Permissive cast: bad input →
    NULL. ``try_cast`` (not ``cast``) so the promise holds under ANY
    session conf — a plain cast throws under ANSI mode (Spark 4
    default)."""
    return col.try_cast("bigint")


@register("transform_op", "to_float")
@register("transform_op", "to_double")
def op_to_double(col: Column, arg: str | None = None) -> Column:
    """[engine extension] numeric cast, NULL on bad input (try_cast —
    ANSI-immune)."""
    return col.try_cast("double")


@register("transform_op", "to_decimal")
def op_to_decimal(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``to_decimal:p.s`` — exact numeric for Oracle
    NUMBER columns (SURVEY.md §7.4.8). Default DECIMAL(38,10)."""
    if arg:
        try:
            p, _, s = arg.partition(".")
            precision, scale = int(p), int(s) if s else 0
        except ValueError as e:
            raise ValueError(
                f"to_decimal arg must be 'precision.scale' or 'precision', "
                f"got {arg!r}"
            ) from e
        return col.try_cast(f"decimal({precision},{scale})")
    return col.try_cast("decimal(38,10)")


@register("transform_op", "to_date")
def op_to_date(col: Column, arg: str | None = None) -> Column:
    """Declared (``table_example.yaml:54``). ``to_date`` or
    ``to_date:<fmt>``; NULL on parse failure (try_* variants — a plain
    ``to_date`` throws on malformed input under ANSI mode)."""
    if arg:
        return F.try_to_timestamp(col, F.lit(arg)).try_cast("date")
    return col.try_cast("date")


@register("transform_op", "to_timestamp")
def op_to_timestamp(col: Column, arg: str | None = None) -> Column:
    """[engine extension]; NULL on parse failure under any session conf."""
    if arg:
        return F.try_to_timestamp(col, F.lit(arg))
    return col.try_cast("timestamp")


@register("transform_op", "to_string")
def op_to_string(col: Column, arg: str | None = None) -> Column:
    """[engine extension] explicit text cast (lookup keys are
    text-normalized in the reference — ``default_lookup.py:60-68``)."""
    return col.cast("string")


@register("transform_op", "hash")
def op_hash(col: Column, arg: str | None = None) -> Column:
    """[engine extension] pseudonymization: ``hash`` → sha256 hex of the
    value; ``hash:<salt>`` prepends a salt so values can't be matched
    across jobs by rainbow lookup. NULL stays NULL (a hashed NULL would
    fabricate a value). JVM-side, deterministic, engine-portable."""
    base = col.cast("string")
    if arg:
        base = F.concat(F.lit(arg + ":"), base)
    return F.when(col.isNotNull(), F.sha2(base, 256))


@register("transform_op", "mask")
def op_mask(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``mask`` / ``mask:<n>`` — redact all but the
    last n characters (default 4) with ``*``; shorter values are fully
    masked. The classic account/card-number display rule."""
    try:
        keep = int(arg) if arg else 4
    except ValueError as e:
        raise ValueError(f"mask arg must be an integer, got {arg!r}") from e
    s = col.cast("string")
    visible = F.substring(s, -keep, keep) if keep > 0 else F.lit("")
    return F.when(
        col.isNotNull(),
        F.when(F.length(s) <= keep, F.repeat(F.lit("*"), F.length(s))).otherwise(
            F.concat(F.repeat(F.lit("*"), F.length(s) - keep), visible)
        ),
    )


@register("transform_op", "extract")
@_string_only
def op_extract(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``extract:<regex>`` — pull the FIRST capture
    group (or the whole match when the pattern has no group) out of the
    value; no match → NULL. The key-normalization workhorse ("the
    digits out of 'ORD-00123'"). Patterns containing commas need the
    LIST form of ``transform`` (the comma-separated string form splits
    on commas first)."""
    if not arg:
        raise ValueError("extract needs a regex: extract:<pattern>")
    import re as _re

    group = 1 if _re.compile(arg).groups >= 1 else 0
    out = F.regexp_extract(col.cast("string"), arg, group)
    # regexp_extract returns '' on no-match — surface NULL instead (an
    # empty string would sail through downstream NOT NULL checks)
    return F.when(out != "", out)


@register("transform_op", "replace")
@_string_only
def op_replace(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``replace:<regex>|<replacement>`` — regex
    substitution (all occurrences; empty replacement deletes). The arg
    splits on the FIRST '|'; escape a literal '|' inside the pattern as
    ``\\|``."""
    import re as _re

    # split on the first UNESCAPED '|' — the pattern keeps its '\|'
    # (which is exactly what the regex engine needs to match a literal
    # pipe), so the separator rule and the regex syntax agree
    parts = _re.split(r"(?<!\\)\|", arg or "", maxsplit=1)
    if not arg or len(parts) != 2:
        raise ValueError(
            "replace needs 'replace:<regex>|<replacement>' (replacement "
            "may be empty; escape a literal pipe in the pattern as \\|)"
        )
    pattern, repl = parts
    if not pattern:
        raise ValueError("replace pattern must be non-empty")
    return F.regexp_replace(col.cast("string"), pattern, repl)


@register("transform_op", "lpad")
@_string_only
def op_lpad(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``lpad:<n>[,<char>]`` — left-pad to width n
    (default pad char '0'; longer values pass through unchanged, same
    as SQL LPAD... no: SQL LPAD truncates — we deliberately DON'T,
    truncating a key corrupts it, so width only ever grows)."""
    if not arg:
        raise ValueError("lpad needs a width: lpad:<n>[,<char>]")
    parts = arg.split(",", 1)
    try:
        width = int(parts[0])
    except ValueError as e:
        raise ValueError(f"lpad width must be an integer, got {parts[0]!r}") from e
    if width < 1:
        raise ValueError(f"lpad width must be >= 1, got {width}")
    ch = parts[1] if len(parts) > 1 and parts[1] else "0"
    if len(ch) != 1:
        raise ValueError(f"lpad pad char must be one character, got {ch!r}")
    sc = col.cast("string")
    # pass-through when already wide enough (SQL LPAD would TRUNCATE)
    return F.when(F.length(sc) >= width, sc).otherwise(F.lpad(sc, width, ch))


@register("transform_op", "normalize_unicode")
def op_normalize_unicode(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``normalize_unicode[:form]`` — Unicode
    normalization (default NFC; NFC/NFD/NFKC/NFKD) so visually-equal
    strings compare equal before dedup/joins — the é-as-one-codepoint
    vs e-plus-combining-accent mismatch that silently splits groups.

    This is the documented pandas_udf ESCAPE HATCH (SURVEY.md §1.2:
    Column expressions first, pandas_udf second, row UDF never): the
    JVM has no normalizer expression, so the op runs as an Arrow-batched
    vectorized UDF — columnar transfer, one Python call per batch, not
    per row. NULLs pass through."""
    form = (arg or "NFC").upper()
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"normalize_unicode form must be NFC|NFD|NFKC|NFKD, got {arg!r}")

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _norm_fn(sr):
        import unicodedata

        return sr.map(
            lambda v: unicodedata.normalize(form, v) if v is not None else None
        )

    # real class objects, not string annotations: the module uses
    # `from __future__ import annotations`, under which a decorator-style
    # `sr: pd.Series` hint becomes an unresolvable string (pd is local)
    _norm_fn.__annotations__ = {"sr": pd.Series, "return": pd.Series}
    return pandas_udf(_norm_fn, "string")(col.cast("string"))


@register("transform_op", "encrypt")
def op_encrypt(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``encrypt:<key>`` — reversible column
    protection via AES (Spark's native ``aes_encrypt``), hex-encoded so
    the output stays a plain string column any target accepts. Unlike
    ``hash`` (one-way) this supports round-trips: load encrypted, grant
    the key only to consumers who may ``decrypt:<key>``.

    Deliberately ECB mode: deterministic output per (key, value) keeps
    the column JOINABLE and GROUPABLE in its encrypted form — the
    standard pseudonymization trade (equal plaintexts are visible as
    equal ciphertexts; use ``hash:<salt>`` where that leak matters and
    no round-trip is needed). Key must be 16/24/32 bytes."""
    if not arg:
        raise ValueError("encrypt needs a key: encrypt:<16|24|32-byte key>")
    nbytes = len(arg.encode("utf-8"))  # AES cares about BYTES, not chars
    if nbytes not in (16, 24, 32):
        raise ValueError(f"encrypt key must be 16/24/32 bytes, got {nbytes}")
    return F.when(
        col.isNotNull(),
        F.hex(F.aes_encrypt(col.cast("string"), F.lit(arg), F.lit("ECB"))),
    )


@register("transform_op", "decrypt")
def op_decrypt(col: Column, arg: str | None = None) -> Column:
    """[engine extension] ``decrypt:<key>`` — inverse of ``encrypt``:
    unhex + AES-decrypt back to the original string. Wrong-key/garbage
    input raises (ANSI) — a silent NULL would read as "value was NULL"."""
    if not arg:
        raise ValueError("decrypt needs a key: decrypt:<16|24|32-byte key>")
    nbytes = len(arg.encode("utf-8"))
    if nbytes not in (16, 24, 32):
        raise ValueError(f"decrypt key must be 16/24/32 bytes, got {nbytes}")
    # unhex returns NULL for non-hex input — without the explicit raise a
    # mis-wired column would silently null out instead of failing
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(
            F.unhex(col).isNull(),
            F.raise_error(
                F.concat(
                    F.lit("decrypt: value is not hex ciphertext: "), col.cast("string")
                )
            ).cast("string"),
        )
        .otherwise(
            F.aes_decrypt(F.unhex(col), F.lit(arg), F.lit("ECB")).cast("string")
        )
    )


def parse_op_token(token: str) -> tuple[str, str | None]:
    """Split ``insert:ACTIVE`` → (name, arg). ``insert:null`` → arg 'null'
    handled by the op; args may contain further colons."""
    if ":" in token:
        name, arg = token.split(":", 1)
        return name.strip(), arg
    return token.strip(), None


def apply_transform_chain(col: Column, ops: list[str] | None, dtype: str) -> Column:
    """Apply an ordered op list to a column (order-sensitivity per
    SURVEY.md §7.4.4). Unknown ops are identity with a debug log, matching
    ``default_transform.py:38-39``. ``dtype`` is the column's Spark
    simpleString type, used to skip string-only ops on non-strings."""
    from ..registry import get_transform_op

    if not ops:
        return col
    for token in ops:
        name, arg = parse_op_token(token)
        fn = get_transform_op(name)
        if fn is None:
            # reference string-hack: any op containing true/false → to_bool
            if "true" in name or "false" in name:
                fn = op_to_bool
            else:
                continue  # forgiving miss: identity
        if getattr(fn, "_string_only", False) and dtype != "string":
            continue  # reference applies string ops only to str values
        col = fn(col, arg)
        if getattr(fn, "_string_only", False) or name in ("insert",):
            dtype = "string"
        elif name in ("to_int",):
            dtype = "bigint"
        elif name in ("to_float", "to_double"):
            dtype = "double"
        elif name == "to_decimal":
            dtype = "decimal"  # later string-only ops must skip it
        elif name == "to_date":
            dtype = "date"
        elif name in ("to_timestamp",):
            dtype = "timestamp"
        elif name == "to_bool" or "true" in name or "false" in name:
            dtype = "boolean"
        elif name in ("to_string", "hash", "mask", "encrypt", "decrypt"):
            dtype = "string"
    return col
