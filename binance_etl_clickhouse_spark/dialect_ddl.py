"""ClickHouse DDL → native table provisioning.

The last piece of the reference's SQL surface that could not previously be
fed to ``engine.sql(..., dialect="clickhouse")`` unchanged: its seven
``CREATE TABLE ... ENGINE = ReplacingMergeTree() ... ORDER BY (...)
[PARTITION BY toYYYYMM(col)] [SETTINGS index_granularity = N]`` strings
(reference ``app/src/crypto_data_pipeline_clickhouse.py:537-608``,
``run_pipeline.py:65-73``). Semantics were already fully covered by the
native ``schemas`` module + ``ServingTable`` keep-last + month partitioning;
this module adds the VERBATIM-migration path: parse the ClickHouse DDL and
provision the equivalent ``ServingTable``.

Clause mapping (each a documented equivalence, not a syntax pun):

====================================  =====================================
ClickHouse                             this engine
====================================  =====================================
CREATE DATABASE [IF NOT EXISTS] db    recorded namespace (tables land under
                                      ``<root>/<db>/``; ``db.tbl`` refs in
                                      inserts/queries resolve to ``tbl``)
ENGINE = ReplacingMergeTree([ver])    keep-last-per-key dedup on read
                                      (``ver`` orders before arrival order)
ENGINE = MergeTree()                  plain append table (no dedup on read)
ORDER BY (cols)                       ServingTable.keys + physical sort —
                                      the dedup identity AND the layout
PRIMARY KEY (cols)                    must be a prefix of ORDER BY (same
                                      rule ClickHouse enforces); the key
                                      index itself is the zonemap sidecar
PARTITION BY toYYYYMM(col)            ServingTable.time_col month dirs
SETTINGS index_granularity = N        accepted and recorded; parquet row
                                      groups + page stats play this role
col DEFAULT expr                      applied on insert when the column is
                                      absent (expr through the dialect)
====================================  =====================================

Type mapping follows the same decisions as ``schemas.py`` and the
``dialect.py`` cast table: LowCardinality unwraps (parquet dictionary
encoding is automatic), DateTime* → TIMESTAMP, unsigned ints widen to the
next signed type that holds the range, and UInt64/Int128 fail LOUDLY (no
Spark type holds them). Unsupported engines or clauses also fail loudly —
never a silent semantic drop.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from binance_etl_clickhouse_spark.operators.dedup import keep_last
from binance_etl_clickhouse_spark.storage.table import INGEST_SEQ, ServingTable

# -- type mapping -----------------------------------------------------------

_SIMPLE_TYPES: dict[str, str] = {
    "string": "string",
    "uuid": "string",
    "date": "date",
    "date32": "date",
    "datetime": "timestamp",
    "float64": "double",
    "float32": "float",
    "bool": "boolean",
    "boolean": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    # unsigned: the next signed type that holds the full range (same rule
    # as dialect.py's to* cast table)
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
}


def ch_type_to_spark(ch_type: str) -> str:
    """ClickHouse column type → Spark SQL type string. Loud on anything
    without an exact-or-wider Spark twin (UInt64, Int128/256, AggregateFunction...)."""
    t = ch_type.strip()
    low = t.lower()
    # wrappers that change storage, not semantics
    m = re.fullmatch(r"lowcardinality\s*\((.*)\)", low, re.S)
    if m:
        return ch_type_to_spark(m.group(1))
    m = re.fullmatch(r"nullable\s*\((.*)\)", low, re.S)
    if m:
        return ch_type_to_spark(m.group(1))  # Spark columns are nullable
    m = re.fullmatch(r"fixedstring\s*\(\s*\d+\s*\)", low)
    if m:
        return "string"
    m = re.fullmatch(r"datetime64\s*\(\s*\d+\s*(?:,\s*'[^']*'\s*)?\)", low)
    if m:
        return "timestamp"
    m = re.fullmatch(r"datetime\s*\(\s*'[^']*'\s*\)", low)
    if m:
        return "timestamp"
    m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", low)
    if m:
        p, s = int(m.group(1)), int(m.group(2))
        if p > 38:
            raise ValueError(f"Decimal({p},{s}) exceeds Spark's max precision 38")
        return f"decimal({p},{s})"
    m = re.fullmatch(r"decimal(32|64)\s*\(\s*(\d+)\s*\)", low)
    if m:
        bits, s = m.group(1), int(m.group(2))
        return f"decimal({9 if bits == '32' else 18},{s})"
    m = re.fullmatch(r"array\s*\((.*)\)", low, re.S)
    if m:
        return f"array<{ch_type_to_spark(m.group(1))}>"
    if low in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[low]
    raise ValueError(
        f"no exact-or-wider Spark type for ClickHouse {ch_type!r} "
        "(UInt64's upper half exceeds BIGINT; map it yourself if lossy is ok)"
    )


# -- parsing ------------------------------------------------------------------


@dataclass
class ParsedDDL:
    kind: str  # "create_database" | "create_table"
    database: str | None
    name: str | None
    if_not_exists: bool = False
    columns: list[tuple[str, str, str | None]] = field(default_factory=list)
    # (name, spark_type, default_expr)
    engine: str | None = None
    version_col: str | None = None
    order_by: list[str] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    partition_time_col: str | None = None
    settings: dict[str, str] = field(default_factory=dict)

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType.fromDDL(
            ", ".join(f"`{n}` {t}" for n, t, _ in self.columns)
        )


_DDL_RE = re.compile(
    r"^\s*(CREATE\s+(DATABASE|TABLE)|DROP\s+TABLE|TRUNCATE\s+TABLE"
    r"|OPTIMIZE\s+TABLE|ALTER\s+TABLE)\b",
    re.I,
)


def is_clickhouse_ddl(sql: str) -> bool:
    return _DDL_RE.match(sql) is not None


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren depth 0 (types/defaults contain parens)."""
    parts, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"`":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _cols_list(clause: str) -> list[str]:
    """`(a, b, c)` or bare `a` → [a, b, c]."""
    clause = clause.strip()
    if clause.startswith("("):
        clause = clause[1:-1] if clause.endswith(")") else clause[1:]
        return [c.strip().strip("`") for c in clause.split(",") if c.strip()]
    return [clause.strip().strip("`")]


def parse_clickhouse_ddl(sql: str) -> ParsedDDL:
    """Parse the reference's DDL shapes. Anything outside them — other
    engines, codecs, TTL, materialized/alias columns — raises."""
    m = re.match(
        r"^\s*CREATE\s+DATABASE\s+(IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*$",
        sql.strip(),
        re.I,
    )
    if m:
        return ParsedDDL(
            kind="create_database",
            database=m.group(2),
            name=None,
            if_not_exists=bool(m.group(1)),
        )
    m = re.match(
        r"^\s*CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?"
        r"(?:(\w+)\.)?(\w+)\s*\((?P<cols>.*)\)\s*"
        r"ENGINE\s*=\s*(?P<engine>\w+)\s*(?:\((?P<engargs>[^)]*)\))?\s*"
        r"(?P<tail>.*)$",
        sql.strip(),
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"unsupported ClickHouse DDL shape: {sql[:120]!r}")
    out = ParsedDDL(
        kind="create_table",
        database=m.group(2),
        name=m.group(3),
        if_not_exists=bool(m.group(1)),
        engine=m.group("engine"),
    )
    if out.engine.lower() not in ("replacingmergetree", "mergetree"):
        raise ValueError(
            f"ENGINE = {out.engine} has no native equivalent here "
            "(supported: ReplacingMergeTree, MergeTree)"
        )
    engargs = (m.group("engargs") or "").strip()
    if engargs:
        if out.engine.lower() != "replacingmergetree":
            raise ValueError(f"unexpected engine arguments: {engargs!r}")
        out.version_col = engargs.strip().strip("`")

    for coldef in _split_top_level(m.group("cols")):
        cm = re.match(
            r"^`?(\w+)`?\s+(?P<type>[\w()\s',]+?)(?:\s+DEFAULT\s+(?P<dflt>.+))?$",
            coldef.strip(),
            re.I | re.S,
        )
        if not cm:
            raise ValueError(f"unsupported column definition: {coldef!r}")
        out.columns.append(
            (cm.group(1), ch_type_to_spark(cm.group("type")), cm.group("dflt"))
        )

    tail = m.group("tail")
    clause_re = re.compile(
        r"(PRIMARY\s+KEY|ORDER\s+BY|PARTITION\s+BY|SETTINGS)\s+", re.I
    )
    marks = [(c.start(), c.end(), c.group(1).upper()) for c in clause_re.finditer(tail)]
    for i, (_, body_start, kw) in enumerate(marks):
        body = tail[body_start : marks[i + 1][0] if i + 1 < len(marks) else len(tail)]
        body = body.strip()
        kw = re.sub(r"\s+", " ", kw)
        if kw == "PRIMARY KEY":
            out.primary_key = _cols_list(body)
        elif kw == "ORDER BY":
            out.order_by = _cols_list(body)
        elif kw == "PARTITION BY":
            pm = re.fullmatch(r"toYYYYMM\s*\(\s*`?(\w+)`?\s*\)", body, re.I)
            if not pm:
                raise ValueError(
                    f"only PARTITION BY toYYYYMM(col) maps to the month "
                    f"layout; got {body!r}"
                )
            out.partition_time_col = pm.group(1)
        elif kw == "SETTINGS":
            for item in body.split(","):
                if "=" in item:
                    k, v = item.split("=", 1)
                    out.settings[k.strip()] = v.strip()
    if not out.order_by:
        raise ValueError("MergeTree-family DDL requires ORDER BY")
    if out.primary_key and out.order_by[: len(out.primary_key)] != out.primary_key:
        # same constraint ClickHouse enforces — a non-prefix PK is invalid DDL
        raise ValueError(
            f"PRIMARY KEY {out.primary_key} is not a prefix of "
            f"ORDER BY {out.order_by}"
        )
    declared = {n for n, _, _ in out.columns}
    for c in out.order_by:
        if c not in declared:
            raise ValueError(f"ORDER BY column {c!r} not in the column list")
    if out.version_col and out.version_col not in declared:
        raise ValueError(f"version column {out.version_col!r} not declared")
    if out.partition_time_col and out.partition_time_col not in declared:
        raise ValueError(
            f"PARTITION BY column {out.partition_time_col!r} not declared"
        )
    return out


def _type_default(spark_type: str) -> F.Column:
    """ClickHouse's implicit default for a non-Nullable column: the type's
    zero value."""
    t = spark_type.lower()
    if t == "string":
        return F.lit("")
    if t in ("date",):
        return F.lit("1970-01-01").cast("date")
    if t == "timestamp":
        return F.lit("1970-01-01 00:00:00").cast("timestamp")
    if t in ("boolean",):
        return F.lit(False)
    if t.startswith("array<"):
        return F.array().cast(spark_type)
    return F.lit(0).cast(spark_type)


# -- catalog ------------------------------------------------------------------


@dataclass
class CatalogEntry:
    ddl: ParsedDDL
    table: ServingTable
    #: columns declared at CREATE time. ALTER-added columns may be missing
    #: from pre-ALTER parquet batches and get the default filled on read;
    #: original columns are default-materialized at INSERT and served RAW —
    #: wrapping them in coalesce() on read would block predicate pushdown
    #: and month-partition pruning (a full-scan-at-100TB hazard).
    original_cols: frozenset[str] = frozenset()

    @property
    def dedup(self) -> bool:
        return self.ddl.engine.lower() == "replacingmergetree"


class DdlCatalog:
    """Tables provisioned from verbatim ClickHouse DDL.

    Each CREATE TABLE becomes a :class:`ServingTable` (keys = ORDER BY,
    month partition from PARTITION BY, keep-last dedup for
    ReplacingMergeTree) plus a temp view under the bare table name serving
    the deduped snapshot — the same querying-ClickHouse convention as
    ``AnalyticsEngine.register_pipeline_tables``. Inserts conform the frame
    to the declared schema (ClickHouse coerces on insert too), fill DEFAULT
    columns, append with the next ingest_seq, and refresh the view.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.databases: set[str] = set()
        self.tables: dict[str, CatalogEntry] = {}

    # -- DDL --------------------------------------------------------------

    def apply(self, sql: str) -> DataFrame:
        for handler in (self._drop, self._truncate, self._optimize, self._alter):
            out = handler(sql)
            if out is not None:
                return out
        ddl = parse_clickhouse_ddl(sql)
        if ddl.kind == "create_database":
            self.databases.add(ddl.database)
            return self.spark.createDataFrame([], T.StructType([]))
        if ddl.name in self.tables:
            if not ddl.if_not_exists:
                raise ValueError(f"table {ddl.name} already exists")
            return self.spark.createDataFrame([], self.tables[ddl.name].ddl.spark_schema)
        if ddl.database:
            self.databases.add(ddl.database)
        path = os.path.join(self.root, ddl.database or "_default", ddl.name)
        entry = CatalogEntry(
            ddl=ddl,
            table=ServingTable(
                path=path,
                keys=list(ddl.order_by),
                time_col=ddl.partition_time_col,
                sort_cols=list(ddl.order_by),
            ),
            original_cols=frozenset(n for n, _, _ in ddl.columns),
        )
        self.tables[ddl.name] = entry
        self._refresh_view(entry)
        return self.spark.createDataFrame([], ddl.spark_schema)

    def _drop(self, sql: str) -> DataFrame | None:
        m = re.match(
            r"^\s*DROP\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$", sql.strip(), re.I
        )
        if not m:
            return None
        bare = self._bare(m.group(2))
        entry = self.tables.pop(bare, None)
        if entry is None:
            if not m.group(1):
                raise KeyError(f"unknown table {m.group(2)!r}")
        else:
            self._rm_data(entry)
            self.spark.catalog.dropTempView(bare)
        return self.spark.createDataFrame([], T.StructType([]))

    def _truncate(self, sql: str) -> DataFrame | None:
        m = re.match(
            r"^\s*TRUNCATE\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.]+)\s*$",
            sql.strip(),
            re.I,
        )
        if not m:
            return None
        entry = self.tables.get(self._bare(m.group(2)))
        if entry is None:
            if not m.group(1):
                raise KeyError(f"unknown table {m.group(2)!r}")
            return self.spark.createDataFrame([], T.StructType([]))
        self._rm_data(entry)
        self._refresh_view(entry)
        return self.spark.createDataFrame([], T.StructType([]))

    def _optimize(self, sql: str) -> DataFrame | None:
        """OPTIMIZE TABLE [FINAL] ≙ ServingTable.compact(): rewrite to
        exactly one version per key; subsequent reads skip the keep-last
        window entirely (the FINAL-is-free fast path)."""
        m = re.match(
            r"^\s*OPTIMIZE\s+TABLE\s+([\w.]+)(\s+FINAL)?\s*$", sql.strip(), re.I
        )
        if not m:
            return None
        entry = self.tables.get(self._bare(m.group(1)))
        if entry is None:
            raise KeyError(f"unknown table {m.group(1)!r}")
        if entry.table.exists():
            entry.table.compact(self.spark)
            self._refresh_view(entry)
        return self.spark.createDataFrame([], T.StructType([]))

    def _alter(self, sql: str) -> DataFrame | None:
        """ALTER TABLE ... ADD COLUMN: the declared schema grows; rows
        written before the ALTER serve the column's default on read
        (ClickHouse materializes the default lazily too — parquet batches
        are immutable here, so the fill happens in the snapshot
        projection via mergeSchema + coalesce)."""
        m = re.match(r"^\s*ALTER\s+TABLE\s+([\w.]+)\s+(?P<rest>.+)$", sql.strip(), re.I | re.S)
        if not m:
            return None
        entry = self.tables.get(self._bare(m.group(1)))
        if entry is None:
            raise KeyError(f"unknown table {m.group(1)!r}")
        rest = m.group("rest").strip()
        # mutations: ALTER TABLE t DELETE WHERE / UPDATE .. WHERE map onto
        # the month-pruned copy-on-write primitives (ClickHouse runs these
        # as asynchronous mutations; here they materialize immediately)
        dm = re.match(r"^DELETE\s+WHERE\s+(?P<cond>.+)$", rest, re.I | re.S)
        if dm:
            n = entry.table.delete_where(
                self.spark, self._fragment(dm.group("cond"))
            )
            self._refresh_view(entry)
            return self.spark.range(1).select(F.lit(n).alias("rows_deleted"))
        um = re.match(
            r"^UPDATE\s+(?P<sets>.+?)\s+WHERE\s+(?P<cond>.+)$", rest, re.I | re.S
        )
        if um:
            assignments = {}
            for item in _split_top_level(um.group("sets")):
                col, _, expr = item.partition("=")
                if not expr:
                    raise ValueError(f"malformed UPDATE assignment: {item!r}")
                assignments[col.strip().strip("`")] = self._fragment(expr)
            n = entry.table.update_where(
                self.spark, self._fragment(um.group("cond")), assignments
            )
            self._refresh_view(entry)
            return self.spark.range(1).select(F.lit(n).alias("rows_updated"))
        am = re.match(
            r"^ADD\s+COLUMN\s+(IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s+"
            r"(?P<type>[\w()\s',]+?)(?:\s+DEFAULT\s+(?P<dflt>.+))?$",
            rest,
            re.I | re.S,
        )
        if not am:
            raise ValueError(
                "unsupported ALTER (ADD COLUMN, DELETE WHERE and "
                f"UPDATE .. WHERE map): {rest!r}"
            )
        cname = am.group(2)
        if any(n == cname for n, _, _ in entry.ddl.columns):
            if not am.group(1):
                raise ValueError(f"column {cname!r} already exists")
            return self.spark.createDataFrame([], entry.ddl.spark_schema)
        entry.ddl.columns.append(
            (cname, ch_type_to_spark(am.group("type")), am.group("dflt"))
        )
        self._refresh_view(entry)
        return self.spark.createDataFrame([], entry.ddl.spark_schema)

    def _rm_data(self, entry: CatalogEntry) -> None:
        import shutil

        p = entry.table.path
        for d in (p, p.rstrip("/") + ".versions", p.rstrip("/") + ".compact.bak",
                  p.rstrip("/") + ".compact.tmp"):
            if os.path.islink(d):
                os.remove(d)
            else:
                shutil.rmtree(d, ignore_errors=True)

    # -- DML --------------------------------------------------------------

    def _bare(self, name: str) -> str:
        """Strip a known-database qualifier (``binance_v2.tbl`` → ``tbl``) —
        the connected-database convention of the reference's client."""
        if "." in name:
            db, _, bare = name.partition(".")
            if db in self.databases or bare in self.tables:
                return bare
        return name

    def insert(self, name: str, rows) -> int:
        """≙ ``clickhouse_insert`` (reference ``utils_clickhouse.py:46-58``):
        accepts a Spark DataFrame, a pandas DataFrame, or a list of dicts;
        conforms to the declared schema; returns rows written."""
        entry = self.tables.get(self._bare(name))
        if entry is None:
            raise KeyError(f"unknown table {name!r} (CREATE it first)")
        if not isinstance(rows, DataFrame):
            import pandas as pd

            pdf = rows if isinstance(rows, pd.DataFrame) else pd.DataFrame(list(rows))
            if pdf.empty:
                return 0
            df = self.spark.createDataFrame(pdf)
        else:
            df = rows
        n = df.count()
        if n == 0:
            return 0
        cols = []
        present = set(df.columns)
        for cname, ctype, dflt in entry.ddl.columns:
            fill = (
                self._default_col(dflt, ctype)
                if dflt is not None
                else _type_default(ctype)
            )
            if cname in present:
                # ClickHouse non-Nullable columns turn inserted NULLs into
                # the default (input_format_null_as_default). Materializing
                # that HERE keeps the at-rest data NULL-free, so reads can
                # serve original columns raw — no coalesce wrapper blocking
                # predicate pushdown / partition pruning.
                cols.append(F.coalesce(F.col(cname).cast(ctype), fill).alias(cname))
            else:
                # absent insert columns take DEFAULT expr or the TYPE
                # default (''/0/epoch/false/[]), not NULL — match CH
                cols.append(fill.alias(cname))
        conformed = df.select(*cols)
        if entry.dedup:
            # within one insert block ReplacingMergeTree keeps the LAST row
            # in insert order; ServingTable's contract expects the writer to
            # have deduped each batch (every row in a batch shares one
            # ingest_seq), so resolve it here by input order
            order = "__insert_order"
            conformed = keep_last(
                conformed.withColumn(order, F.monotonically_increasing_id()),
                entry.table.keys,
                ([entry.ddl.version_col] if entry.ddl.version_col else []) + [order],
            ).drop(order)
        entry.table.append(
            conformed, ingest_seq=entry.table.max_ingest_seq(self.spark) + 1
        )
        self._refresh_view(entry)
        return int(n)

    # -- views ------------------------------------------------------------

    def snapshot(self, name: str) -> DataFrame:
        """The served state: ReplacingMergeTree tables resolve keep-last per
        ORDER BY key (version column first when declared, arrival order as
        the tie-break — exactly ClickHouse's version-else-insert-order
        rule); MergeTree tables serve every row. The result is projected to
        the DECLARED schema: batches written before an ALTER TABLE ADD
        COLUMN read back the column's default (mergeSchema surfaces them as
        NULL; the coalesce materializes the ClickHouse lazy-default)."""
        entry = self.tables[self._bare(name)]
        if not entry.table.exists():
            return self.spark.createDataFrame([], entry.ddl.spark_schema)
        altered = [c for c in entry.ddl.columns if c[0] not in entry.original_cols]
        # mergeSchema only when an ALTER widened the schema — it reads every
        # file footer, and steady-state tables take the single-footer path
        raw = entry.table.read_raw(self.spark, merge_schema=bool(altered))
        if entry.dedup:
            order = (
                [entry.ddl.version_col, INGEST_SEQ]
                if entry.ddl.version_col
                else INGEST_SEQ
            )
            raw = keep_last(raw, entry.table.keys, order)
        if not altered:
            # the common path: raw columns pass through untouched, so
            # predicates reach the parquet scan (PushedFilters + per-file
            # footer stats skip disjoint files — the key-sorted layout
            # makes timestamp ranges narrow per file). Month-DIR pruning
            # from a timestamp predicate would need predicate-to-partition
            # derivation Spark doesn't do through a view; planned time
            # scans use ServingTable.read_pruned for that.
            return raw.drop(INGEST_SEQ)
        present = set(raw.columns)
        cols = []
        for cname, ctype, dflt in entry.ddl.columns:
            if cname in entry.original_cols:
                cols.append(F.col(cname))
                continue
            # ALTER-added column: pre-ALTER batches surface NULL through
            # mergeSchema (or miss it entirely) — fill the declared default,
            # ClickHouse's lazy-materialization semantics. These can never
            # be key/partition columns (CREATE declares those), so pruning
            # is unaffected.
            fill = (
                self._default_col(dflt, ctype)
                if dflt is not None
                else _type_default(ctype)
            )
            base = F.col(cname).cast(ctype) if cname in present else F.lit(None).cast(ctype)
            cols.append(F.coalesce(base, fill).alias(cname))
        return raw.select(*cols)

    def _fragment(self, expr: str) -> str:
        """Run one expression through the scalar dialect (the translator
        takes statements, so SELECT-wrap and unwrap)."""
        from binance_etl_clickhouse_spark.dialect import translate_clickhouse_sql

        return translate_clickhouse_sql(f"SELECT {expr.strip()}")[len("SELECT ") :]

    def _default_col(self, dflt: str, ctype: str) -> F.Column:
        return F.expr(self._fragment(dflt)).cast(ctype)

    def _refresh_view(self, entry: CatalogEntry) -> None:
        self.snapshot(entry.ddl.name).createOrReplaceTempView(entry.ddl.name)

    # -- query-side name resolution ----------------------------------------

    def resolve_qualified(self, query: str) -> str:
        """Strip created-database qualifiers from table references
        (``SELECT ... FROM binance_v2.bn_spot_symbols`` → the bare view) —
        the reference's client connects to a database, so its queries mix
        qualified and bare names freely. String literals are left alone."""
        if not self.databases:
            return query
        pattern = re.compile(
            r"(?<![\w.`])(" + "|".join(map(re.escape, self.databases)) + r")\.(?=\w)"
        )
        parts = re.split(r"('(?:[^']|'')*')", query)  # keep quoted literals
        return "".join(
            p if i % 2 else pattern.sub("", p) for i, p in enumerate(parts)
        )
