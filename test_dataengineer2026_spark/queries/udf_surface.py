"""UDF / UDAF / UDTF surface V1-V4 (SURVEY.md §2.11).

Reference basis: the spec leaves technology open including Python libs
and LLM calls (TEST.md:80-99) — in Spark terms that is the Pandas-UDF
family. Everything here crosses the JVM->Python boundary through Arrow
batches (never per-row pickling), and each UDF's arithmetic is written
to be bit-deterministic so the queries stay oracle-checked:

* sums inside UDFs run as sequential double folds (matches list_sum);
* weighted aggregates use exact decimal.Decimal accumulation mirroring
  the SQL CAST(... AS DECIMAL) pipeline.
"""

from __future__ import annotations

import decimal
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from test_dataengineer2026_spark import tables
from test_dataengineer2026_spark.registry import register
from test_dataengineer2026_spark.tables import parallelize
from test_dataengineer2026_spark.session import apply_runtime_confs


@F.pandas_udf(T.DoubleType())
def l2_norm_udf(emb: pd.Series) -> pd.Series:
    """V1: vectorized scalar Pandas UDF — L2 norm of ARRAY<FLOAT>.

    Sequential fold keeps it bit-identical to the SQL/aggregate path.
    """

    def norm(v) -> float:
        acc = 0.0
        for x in v:
            fx = float(x)
            acc += fx * fx
        return acc**0.5

    return emb.map(norm)


@register(
    "V1_scalar_pandas_udf",
    oracle="""
SELECT vec_id, label,
       round(sqrt(list_sum(list_transform(generate_series(1,64),
             i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))), 9) AS norm
FROM embeddings
""",
    tags=("udf", "vector"),
)
def scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1: Arrow-batched scalar UDF over the embedding column."""
    apply_runtime_confs(spark)
    e = tables.load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", "label", F.round(l2_norm_udf("embedding"), 9).alias("norm")
    )


@register(
    "V2_grouped_map_udf",
    oracle="""
SELECT c_custkey, c_nationkey,
       round((c_acctbal - MIN(c_acctbal) OVER w)
             / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w), 9) AS acctbal_minmax
FROM customer
WINDOW w AS (PARTITION BY c_nationkey)
""",
    tags=("udf", "applyInPandas"),
)
def grouped_map_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2: applyInPandas grouped-map — per-nation min-max normalization
    (per-doc table assembly shape, TEST.md:83). min/max are exact, the
    normalize is one subtract + one divide per row."""
    apply_runtime_confs(spark)
    c = tables.load(spark, sf_dir, "customer")

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        lo, hi = pdf["c_acctbal"].min(), pdf["c_acctbal"].max()
        out = pdf[["c_custkey", "c_nationkey"]].copy()
        out["acctbal_minmax"] = ((pdf["c_acctbal"] - lo) / (hi - lo)).round(9)
        return out

    return c.groupBy("c_nationkey").applyInPandas(
        normalize, schema="c_custkey long, c_nationkey int, acctbal_minmax double"
    )


@F.pandas_udf(T.DoubleType())
def weighted_avg_disc_udf(qty: pd.Series, disc: pd.Series) -> float:
    """V3: grouped-agg Pandas UDAF — quantity-weighted mean discount.

    Exact decimal accumulation mirrors the SQL
    CAST(SUM(CAST(q AS DECIMAL(18,4)) * CAST(d AS DECIMAL(8,4))) ...)
    pipeline: shortest-repr Decimal(str(x)) equals the 4dp decimal cast
    for this <=2dp data, sums are exact, one final double division.
    """
    swx = decimal.Decimal(0)
    sw = decimal.Decimal(0)
    for q, d in zip(qty, disc):
        qd = decimal.Decimal(str(q))
        dd = decimal.Decimal(str(d))
        swx += qd * dd
        sw += qd
    return float(swx) / float(sw)


@register(
    "V3_grouped_agg_udaf",
    oracle="""
SELECT l_returnflag,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(18,6)) AS DOUBLE)
         / CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(18,6)) AS DOUBLE) AS wavg_discount
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("udf", "udaf"),
)
def grouped_agg_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3: custom aggregate — the spec's tonnage-weighted grade mean
    (TEST.md:38-48) expressed as a Pandas UDAF."""
    apply_runtime_confs(spark)
    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        weighted_avg_disc_udf("l_quantity", "l_discount").alias("wavg_discount")
    )


@register(
    "V4_python_udtf",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
), chunks AS (
  SELECT doc_id, g.i AS chunk_idx,
         array_to_string(tok[g.i * 10 + 1 : g.i * 10 + 10], ' ') AS chunk_text
  FROM toks, unnest(generate_series(0, 200)) AS g(i)
  WHERE g.i * 10 < len(tok)
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text
FROM chunks
""",
    tags=("udf", "udtf"),
)
def python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V4: one-to-many generation (document -> 10-token training chunks),
    as an array-returning Pandas UDF + posexplode — the UDTF pattern
    (SURVEY §2.11 V4) with Arrow batching."""
    apply_runtime_confs(spark)
    d = tables.load(spark, sf_dir, "documents")

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def chunker(text: pd.Series) -> pd.Series:
        def chunks(t: str) -> list[str]:
            tok = t.split(" ")
            return [" ".join(tok[i : i + 10]) for i in range(0, len(tok), 10)]

        return text.map(chunks)

    return d.select(
        "doc_id", F.posexplode(chunker("text")).alias("chunk_idx", "chunk_text")
    )


def _arrow_doc_stats(batches):
    """V7 kernel: pure-Arrow columnar compute — no pandas materialization,
    no Python-per-row loop; every op is a vectorized pyarrow.compute call
    over the incoming RecordBatch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        t = b.column("text")
        words = pc.split_pattern(t, " ")
        yield pa.RecordBatch.from_arrays(
            [
                b.column("doc_id"),
                pc.cast(pc.binary_length(pc.cast(t, pa.binary())), pa.int64()),
                pc.cast(pc.list_value_length(words), pa.int64()),
                pc.list_element(words, 0),
            ],
            names=["doc_id", "n_bytes", "n_words", "first_word"],
        )


@register(
    "V7_map_in_arrow",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
       string_split(text, ' ')[1] AS first_word
FROM documents
""",
    tags=("udf", "arrow"),
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V7: mapInArrow — the zero-copy tier of the Python UDF surface:
    batches arrive as Arrow RecordBatches and are transformed with
    pyarrow.compute kernels, never converted to pandas (mapInPandas'
    per-batch DataFrame construction cost disappears; for wide binary
    columns that conversion is the dominant overhead). Same plan shape
    as V5: one ArrowEvalPython-style exchange-free map stage at source
    width — the right tier for byte-level multimodal preprocessing
    where pandas object-dtype boxing would double memory."""
    apply_runtime_confs(spark)
    d = tables.load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(
        _arrow_doc_stats,
        "doc_id long, n_bytes long, n_words long, first_word string",
    )


def _cents(x: pd.Series) -> int:
    """Exact integer cents from a 2dp-valued double column: scale, rint,
    sum as int64 — integer addition is order-independent, so the result
    is deterministic under any pandas batch ordering."""
    import numpy as np

    if len(x) == 0:
        return 0
    return int(np.rint(x.to_numpy(dtype="float64") * 100.0).astype("int64").sum())


def _merge_spend(key, orders_pdf: pd.DataFrame, events_pdf: pd.DataFrame):
    """V8 cogroup body: one output row per key with both sides' counts
    and exact-cent totals — either side may be empty for a given key."""
    (k,) = key
    return pd.DataFrame(
        {
            "key": [k],
            "n_orders": [len(orders_pdf)],
            "order_cents": [_cents(orders_pdf["o_totalprice"])]
            if len(orders_pdf)
            else [0],
            "n_events": [len(events_pdf)],
            "event_cents": [_cents(events_pdf["value"])]
            if len(events_pdf)
            else [0],
        }
    )


@register(
    "V8_cogrouped_pandas",
    oracle="""
WITH o AS (
  SELECT o_custkey AS k, COUNT(*) AS n_orders,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS oc
  FROM orders GROUP BY 1
),
e AS (
  SELECT user_id AS k, COUNT(*) AS n_events,
         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS ec
  FROM events GROUP BY 1
)
SELECT COALESCE(o.k, e.k) AS key,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.oc, 0) AS order_cents,
       COALESCE(e.n_events, 0) AS n_events,
       COALESCE(e.ec, 0) AS event_cents
FROM o FULL OUTER JOIN e ON o.k = e.k
""",
    tags=("udf", "cogroup"),
)
def cogrouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V8: the cogrouped-map UDF tier —
    ``groupBy().cogroup().applyInPandas`` hands BOTH tables' rows for
    the same key to one Python function (orders by o_custkey, events by
    user_id), completing the UDF surface (V1 scalar, V2 grouped map, V3
    grouped agg, V4 UDTF, V5/V7 map tiers).

    Cogroup is Spark's align-two-tables-in-Python primitive (the
    merge-asof / custom-join escape hatch). Plan shape: each side
    shuffles once on its key, then Arrow ships per-key row groups to
    Python with NO join materialized first. The body does integer-cent
    sums (scale, rint, int64) so Python-side float ordering can't leak
    into results; the oracle is the equivalent FULL OUTER JOIN of two
    aggregates. At 100 TB the Python body must stay O(rows-per-key) —
    heavy per-key math belongs in V3/built-ins — but the cogroup
    NETWORK cost is exactly two co-partitioned shuffles, same as a SQL
    join.
    """
    apply_runtime_confs(spark)
    # Width must track the PYTHON work, not the shuffle bytes: the body
    # runs once per key (~15k keys at sf0.1), and AQE's byte-based
    # coalescing packs those calls onto 2-3 tasks (the keyed rows are
    # only a few MB). Hash-distributing each side on its key before the
    # cogroup pins the per-key calls across every core — the cogroup
    # reuses the explicit exchanges, so no extra shuffle is added.
    # r18 measured: 14.3 s / 5 tasks -> 2.7 s / 34 tasks warm at sf0.1.
    o = parallelize(
        tables.load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        "o_custkey",
    )
    e = parallelize(
        tables.load(spark, sf_dir, "events").select("user_id", "value"),
        "user_id",
    )
    out = (
        o.groupBy("o_custkey")
        .cogroup(e.groupBy("user_id"))
        .applyInPandas(
            _merge_spend,
            schema="key long, n_orders long, order_cents long, "
            "n_events long, event_cents long",
        )
    )
    return out


@register(
    "V9_apply_in_arrow",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(MAX(l_quantity) - MIN(l_quantity) AS BIGINT) AS qty_range,
       CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_linenumber AS BIGINT)) AS BIGINT)
         AS qty_line_dot
FROM lineitem GROUP BY l_returnflag
""",
    tags=("udf", "applyInArrow"),
)
def apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V9: ``groupBy().applyInArrow`` (Spark 4.0) — the Arrow-NATIVE
    grouped-map tier: the task function receives each group as a
    ``pyarrow.Table`` and computes with ``pyarrow.compute`` kernels, no
    pandas materialization at all (V2's applyInPandas pays the
    Arrow->pandas->Arrow round-trip; this skips both conversions). The
    per-group aggregate here (count, quantity range, an integer dot
    product) is deliberately exactly-representable so the oracle hash
    is bitwise: every kernel runs over int64.

    Scale posture: same shuffle as any grouped map (hash partition by
    key), Arrow columns flow zero-copy from the JVM; the right tier for
    group-wise NUMERIC kernels at 100 TB where pandas per-group
    overhead (index allocation, block consolidation) measurably taxes
    small groups."""
    apply_runtime_confs(spark)
    import pyarrow as pa
    import pyarrow.compute as pc

    li = tables.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_linenumber"
    )

    def group_stats(table: pa.Table) -> pa.Table:
        qty = pc.cast(table["l_quantity"], pa.int64())
        line = pc.cast(table["l_linenumber"], pa.int64())
        return pa.table(
            {
                "l_returnflag": [table["l_returnflag"][0].as_py()],
                "n_rows": [table.num_rows],
                "qty_range": [
                    pc.subtract(pc.max(qty), pc.min(qty)).as_py()
                ],
                "qty_line_dot": [pc.sum(pc.multiply(qty, line)).as_py()],
            }
        )

    return li.groupBy("l_returnflag").applyInArrow(
        group_stats,
        schema="l_returnflag string, n_rows long, qty_range long, qty_line_dot long",
    )


#: One truth for BOTH chunking surfaces: V4 (array-returning pandas UDF
#: + posexplode) and V10 (the real class-based @udtf) register the SAME
#: oracle, so the two implementations are pinned to agree — the M6/M6b
#: two-surfaces-one-fold pattern applied to the UDTF API.
_CHUNK_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
), chunks AS (
  SELECT doc_id, g.i AS chunk_idx,
         array_to_string(tok[g.i * 10 + 1 : g.i * 10 + 10], ' ') AS chunk_text
  FROM toks, unnest(generate_series(0, 200)) AS g(i)
  WHERE g.i * 10 < len(tok)
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text
FROM chunks
"""


@register(
    "V10_class_udtf",
    oracle=_CHUNK_ORACLE,
    tags=("udf", "udtf"),
)
def class_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V10: the REAL Python UDTF API (Spark 3.5/4.x ``@udtf`` class,
    ``spark.udtf.register``, SQL LATERAL invocation) computing V4's
    exact chunking — V4 exhibits the same one-to-many generation as an
    array UDF + posexplode, and the shared oracle pins the two surfaces
    to identical output. Arrow-batched transfer is enabled for the UDTF
    (eval is still row-logical; the batching is the wire tier).

    Scale posture: a UDTF is a per-partition generator — no shuffle is
    introduced by the LATERAL; output cardinality (~tokens/10 per doc)
    is the workload, identical to V4's."""
    apply_runtime_confs(spark)
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="chunk_idx int, chunk_text string")
    class SplitChunks:
        def eval(self, text: str):
            tok = text.split(" ")
            for i in range(0, len(tok), 10):
                yield (i // 10, " ".join(tok[i : i + 10]))

    spark.udtf.register("split_chunks_v10", SplitChunks)
    tables.load(spark, sf_dir, "documents").createOrReplaceTempView("v10_docs")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.chunk_text "
        "FROM v10_docs d, LATERAL split_chunks_v10(d.text) c"
    )


@register(
    "V11_polymorphic_udtf",
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tok FROM documents
)
SELECT doc_id,
       CAST(g.i - 1 AS INTEGER) AS pos,
       tok[g.i] AS tok_0,
       tok[g.i + 1] AS tok_1
FROM toks, unnest(generate_series(1, len(tok) - 1)) AS g(i)
""",
    tags=("udf", "udtf", "polymorphic"),
)
def polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V11: POLYMORPHIC Python UDTF — the static ``analyze()`` hook
    (pyspark.sql.udtf.AnalyzeArgument/AnalyzeResult) computes the
    output schema at plan time from a CONSTANT argument: ``ngrams(text,
    n)`` emits columns tok_0..tok_{n-1}, so the same function serves
    bigram and trigram extraction with a schema Catalyst knows
    statically. This is the schema-from-arguments half of the UDTF API
    that a fixed returnType cannot express (the n-gram family is the
    repo's bread and butter — T-family shingles, D3 Jaccard — here as
    a reusable table function).

    The query runs n=2 over documents; the oracle recomputes bigrams
    relationally. analyze() asserts the argument is a foldable constant
    — a column-dependent n would make the schema data-dependent, which
    the API (and relational algebra) forbids."""
    apply_runtime_confs(spark)
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not n.isConstantExpression or not isinstance(n.value, int):
                raise ValueError("ngrams(text, n): n must be a constant int")
            fields = [
                StructField(f"tok_{i}", StringType()) for i in range(n.value)
            ]
            return AnalyzeResult(
                StructType([StructField("pos", IntegerType())] + fields)
            )

        def eval(self, text: str, n: int):
            tok = text.split(" ")
            for i in range(len(tok) - n + 1):
                yield (i, *tok[i : i + n])

    spark.udtf.register("ngrams_v11", NGrams)
    tables.load(spark, sf_dir, "documents").createOrReplaceTempView("v11_docs")
    return spark.sql(
        "SELECT d.doc_id, g.pos, g.tok_0, g.tok_1 "
        "FROM v11_docs d, LATERAL ngrams_v11(d.text, 2) g"
    )


@register(
    "V12_pandas_api_parity",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS cust_sum,
       CAST(MIN(o_orderdate) AS DATE) AS first_date,
       CAST(MAX(o_orderdate) AS DATE) AS last_date
FROM orders GROUP BY o_orderstatus
""",
    tags=("udf", "pandas_api"),
)
def pandas_api_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V12: the pandas API on Spark (``pyspark.pandas``) — the last
    untouched public user surface (r16 verdict, missing #3) — proven
    value-equivalent to the SQL engine on the M6/M6b "two surfaces,
    one truth" pattern: a pandas-idiom groupby/agg over orders is
    lowered to the same Catalyst plan family and must hash-match the
    DuckDB oracle.

    The exhibit is written pandas-first (read_parquet → groupby → agg
    → reset_index), then ``to_spark()`` hands back the engine
    DataFrame. Aggregates are chosen exact-on-purpose: COUNT and an
    integer SUM (bit-deterministic in any order) and MIN/MAX dates —
    no float accumulation, so parity is provable without the dsum
    DECIMAL machinery (which the pandas surface cannot express).
    pandas-on-Spark returns dates as timestamp_ntz; the final cast
    back to DATE is the only engine-level touch-up.

    Scale posture: ps.read_parquet is the SAME distributed parquet
    scan (pushdown/pruning intact), and the groupby lowers to a
    hash-aggregate exchange — pandas syntax, not pandas execution; no
    driver materialization anywhere. The one surface-level cost to
    know about: pyspark.pandas maintains a default index; reset_index
    + immediate to_spark keeps it out of the plan. ANSI off comes from
    RUNTIME_CONFS (the pandas API's permissive-cast contract).
    """
    apply_runtime_confs(spark)
    import pyspark.pandas as ps

    pdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
    g = (
        pdf.groupby("o_orderstatus")
        .agg(
            n_orders=("o_orderkey", "count"),
            cust_sum=("o_custkey", "sum"),
            first_date=("o_orderdate", "min"),
            last_date=("o_orderdate", "max"),
        )
        .reset_index()
    )
    out = g.to_spark()
    return out.withColumn("first_date", F.col("first_date").cast("date")).withColumn(
        "last_date", F.col("last_date").cast("date")
    )


@register(
    "V13_udtf_table_argument",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       (list(event_id ORDER BY ts, event_id)
          FILTER (WHERE event_type = 'purchase'))[1] AS first_purchase_id
FROM events GROUP BY user_id
""",
    tags=("udf", "udtf", "table_argument"),
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V13: UDTF with a TABLE argument — ``f(TABLE(t) PARTITION BY k
    ORDER BY o)`` (Spark 3.5/4.x), the surface that turns a Python
    UDTF into a full GROUP-WISE analytic operator: Spark shuffles the
    table on the PARTITION BY key, sorts each group by the ORDER BY,
    and feeds one UDTF instance per group, rows in order. V4/V10/V11
    cover scalar-argument UDTFs (one eval per row, no grouping); this
    is the missing shape — the same contract as applyInPandas but
    reachable from pure SQL text.

    The exhibit depends on BOTH clauses: n_events needs the partition
    (all of a user's rows in one instance), first_purchase_id needs
    the order (the FIRST purchase by (ts, event_id) — the UDTF just
    takes the first purchase row it SEES, which is only correct
    because Spark delivered rows sorted). The oracle recomputes it
    with an ordered filtered list aggregate.

    Scale posture: one shuffle on user_id + per-partition sort —
    identical exchange shape to a window query; the UDTF runs
    arrow-batched per group. State is two scalars per group,
    independent of group size."""
    apply_runtime_confs(spark)
    tables.register_views(spark, sf_dir)
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, first_purchase_id bigint")
    class FirstPurchase:
        def __init__(self):
            self.user_id = None
            self.n = 0
            self.first_purchase = None

        def eval(self, row):
            self.user_id = row["user_id"]
            self.n += 1
            if self.first_purchase is None and row["event_type"] == "purchase":
                self.first_purchase = row["event_id"]

        def terminate(self):
            yield self.user_id, self.n, self.first_purchase

    spark.udtf.register("v13_first_purchase", FirstPurchase)
    return spark.sql(
        """
SELECT * FROM v13_first_purchase(
  TABLE(SELECT user_id, event_type, event_id, ts FROM events)
  PARTITION BY user_id
  ORDER BY (ts, event_id)
)
"""
    )
