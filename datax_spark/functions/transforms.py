"""dx_* row-level transformer parity, as Catalyst column expressions.

The reference applies a per-record transformer chain between reader
and channel (``TransformerExchanger.java:53-110``; registry
``TransformerRegistry.java:28-44``). Here every transform is a
declarative Column expression — Catalyst folds the whole chain into
whole-stage codegen, so a 6-transform chain costs one pass over the
data instead of six interpreted per-record calls.

Semantics are matched to the reference implementations (read, not
copied — each docstring cites the file):

* dx_substr   — SubstrTransformer.java:22-41 (0-based start, clamp to
  end-of-string, NULL passes through untouched). Deviation: the
  reference ABORTS the task when startIndex > len; a distributed
  engine cannot throw per-row cheaply, so we yield '' and leave
  abort-on-bad-row to the dirty-data policy.
* dx_pad      — PadTransformer.java:17-36 (pad to length with repeated
  padString, TRUNCATE when already longer, NULL treated as '').
* dx_replace  — ReplaceTransformer.java:17-35 (splice-replace the
  0-based [start, start+length) range; NULL passes through).
* dx_filter   — FilterTransformer.java:20-311. Match ⇒ DROP the row
  (inverted sense). Null rules, verbatim from the reference:
  - >  >= <  <=  : NULL never matches → row kept
  - =            : NULL matches only the literal value "null"
  - !=           : NULL matches anything EXCEPT the literal "null"
  - like         : Java String.matches (ANCHORED full-string regex);
                   NULL never matches → kept
  - not like     : NULL (or non-match) ⇒ DROPPED (reference drops
                   when the value does not match)
* dx_json     — JsonTransformer.java:28-100 (dot-path projection of a
  JSON string column).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve via module globals
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dx_substr(col: Column | str, start: int, length: int) -> Column:
    """0-based substring with clamp-to-end; NULL → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, start + 1, length)


def dx_pad(col: Column | str, pad_type: str, length: int, pad_string: str) -> Column:
    """Pad to ``length`` ('l' or 'r'), truncating when longer; NULL → ''."""
    if pad_type.lower() not in ("l", "r"):
        raise ValueError(f"dx_pad first para ({pad_type}) must be 'l' or 'r'")
    c = F.coalesce(F.col(col) if isinstance(col, str) else col, F.lit(""))
    fn = F.lpad if pad_type.lower() == "l" else F.rpad
    return fn(c, length, pad_string)


def dx_replace(col: Column | str, start: int, length: int, replace_string: str) -> Column:
    """Splice-replace the 0-based [start, start+length) range; NULL → NULL."""
    c = F.col(col) if isinstance(col, str) else col
    head = F.substring(c, 1, start)
    tail = F.substring(c, start + length + 1, 2_000_000_000)
    return F.concat(head, F.lit(replace_string), tail)


def dx_encryption(
    col: Column | str, key: str, mode: str = "encrypt", cipher: str = "ECB"
) -> Column:
    """Column encryption/decryption — the dx_encryption transformer
    (EncryptionTransformer.java:28-135; SM4 via core/.../Sm4Util.java).

    SM4 is not in public Spark; AES (built-in ``aes_encrypt``/
    ``aes_decrypt``, JVM-side) is the public-crypto equivalent with the
    same shape: symmetric key, column in, opaque bytes out. ECB is the
    default for parity with the reference's deterministic per-value
    output (same plaintext -> same ciphertext, required for equality
    joins on encrypted columns); pass ``cipher='GCM'`` for the
    IV-randomized authenticated mode when determinism is not needed.
    Returns base64 text for 'encrypt', decrypted string for 'decrypt'.

    ``cipher='SM4'`` gives BYTE parity with the reference
    (SM4/ECB/PKCS5Padding, hex key in, hex ciphertext out —
    functions/sm4.py, validated against the GB/T 32907 vectors) via an
    Arrow-batched pandas UDF. It exists for interop with data the
    reference already encrypted; AES stays the performance path (JVM,
    hardware AES-NI) for bulk columns.
    """
    c = F.col(col) if isinstance(col, str) else col
    if mode not in ("encrypt", "decrypt"):
        raise ValueError(
            f"dx_encryption mode must be encrypt|decrypt, got {mode}"
        )
    if cipher.upper() == "SM4":
        from pyspark.sql.functions import pandas_udf

        from datax_spark.functions.sm4 import decrypt_ecb_hex, encrypt_ecb_hex

        fn = encrypt_ecb_hex if mode == "encrypt" else decrypt_ecb_hex

        @pandas_udf("string")
        def _sm4(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None else fn(key, v))

        return _sm4(c)
    k = F.lit(key)
    if mode == "encrypt":
        return F.base64(F.aes_encrypt(c, k, F.lit(cipher)))
    return F.aes_decrypt(F.unbase64(c), k, F.lit(cipher)).cast("string")


def dx_json(col: Column | str, dot_path: str) -> Column:
    """Project a dot-path out of a JSON string column."""
    c = F.col(col) if isinstance(col, str) else col
    path = dot_path if dot_path.startswith("$") else f"$.{dot_path}"
    return F.get_json_object(c, path)


_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def dx_filter_drops(df_col: Column, op: str, value: str, col_type: str = "string") -> Column:
    """Boolean column: True where the reference would DROP the row."""
    c = df_col
    base = col_type.split("(")[0].lower()
    if base in _NUMERIC:
        lit = F.lit(float(value)) if base in ("double", "float") else F.lit(int(value))
    else:
        c = c.cast("string")
        lit = F.lit(value)

    o = op.lower()
    if o in (">", ">=", "<", "<="):
        cmp = {">": c > lit, ">=": c >= lit, "<": c < lit, "<=": c <= lit}[o]
        return F.coalesce(cmp, F.lit(False))  # NULL never matches → kept
    if o in ("=", "=="):
        return F.when(c.isNull(), F.lit(value.lower() == "null")).otherwise(c == lit)
    if o == "!=":
        return F.when(c.isNull(), F.lit(value.lower() != "null")).otherwise(c != lit)
    if o == "like":
        # Java String.matches is an anchored full match
        return F.coalesce(c.cast("string").rlike(f"^(?:{value})$"), F.lit(False))
    if o == "not like":
        return ~F.coalesce(c.cast("string").rlike(f"^(?:{value})$"), F.lit(False))
    raise ValueError(f"dx_filter can't support code: {op}")


def dx_filter(df: DataFrame, col: str, op: str, value: str) -> DataFrame:
    """Apply dx_filter: drop rows where the predicate matches."""
    col_type = dict(df.dtypes)[col]
    return df.filter(~dx_filter_drops(F.col(col), op, value, col_type))


class TransformChain:
    """Ordered dx_* chain, the analog of the job-JSON ``transformer``
    list (``TransformerUtil.buildTransformerInfo``). Specs:

        {"name": "dx_substr",  "column": "c", "paras": [start, len]}
        {"name": "dx_pad",     "column": "c", "paras": ["l", len, pad]}
        {"name": "dx_replace", "column": "c", "paras": [start, len, rep]}
        {"name": "dx_filter",  "column": "c", "paras": [op, value]}
        {"name": "dx_json",    "column": "c", "paras": [path], "as": "out"}
        {"name": "dx_udf",     "fn": callable(df) -> df}   # dx_groovy analog:
            arbitrary user transform — by policy a VECTORIZED pandas-UDF
            composition, never per-row Python (GroovyTransformer.java:25-91)

    Catalyst collapses the whole chain into a single projection +
    filter over the scan; nothing is interpreted per record.
    """

    def __init__(self, specs: list[dict]):
        self.specs = specs

    def apply(self, df: DataFrame) -> DataFrame:
        for s in self.specs:
            name = s["name"]
            if name == "dx_filter":
                df = dx_filter(df, s["column"], *s["paras"])
            elif name == "dx_substr":
                df = df.withColumn(s.get("as", s["column"]), dx_substr(s["column"], *s["paras"]))
            elif name == "dx_pad":
                df = df.withColumn(s.get("as", s["column"]), dx_pad(s["column"], *s["paras"]))
            elif name == "dx_replace":
                df = df.withColumn(s.get("as", s["column"]), dx_replace(s["column"], *s["paras"]))
            elif name == "dx_json":
                df = df.withColumn(s.get("as", s["column"]), dx_json(s["column"], *s["paras"]))
            elif name == "dx_encryption":
                df = df.withColumn(
                    s.get("as", s["column"]), dx_encryption(s["column"], *s["paras"])
                )
            elif name == "dx_udf":
                fn: Callable[[DataFrame], DataFrame] = s["fn"]
                df = fn(df)
            else:
                raise ValueError(f"unknown transformer: {name}")
        return df
