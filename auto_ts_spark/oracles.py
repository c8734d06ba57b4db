"""DuckDB oracle SQL for every value-checked query in
``__spark_entry__.queries()`` — the driver (and ``tests/parity.py``)
runs each ``ORACLES[name]`` against the same parquet tables the Spark
query reads and compares row count + schema + value hash.

Factored out of ``__spark_entry__.py`` (the oracle definitions are
~2,000 LoC of SQL that only the correctness harness reads); the entry
file keeps the Spark-side ``q_*`` functions and the driver contract
(``entry`` / ``queries`` / ``oracle_sql``). Each oracle documents the
exact semantics its Spark twin re-expresses, so they live in
definition order matching the q_ functions.
"""

from __future__ import annotations

from auto_ts_spark.functions import text as TX


# DuckDB fragment: normalized whitespace tokens of `text`
_SQL_TOKS = (
    "string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"
)

def _sql_hash60(expr: str) -> str:
    return f"cast(cast(concat('0x', substr(md5({expr}), 1, 15)) as ubigint) as bigint)"

# Plain-double daily series (the W15-18/M-oracle CTE body; the decimal
# variant below is for money-exact replays)
_SQL_DAILY_PLAIN = (
    "SELECT date_trunc('day', ts) AS ts, sum(value) AS y\n"
    "  FROM events GROUP BY 1"
)

# DuckDB replica of _daily_decimal_series (splice into a CTE body)
_SQL_DAILY = (
    "SELECT date_trunc('day', ts) AS ts,\n"
    "         cast(sum(cast(value AS decimal(20,2))) AS double) AS y\n"
    "  FROM events GROUP BY 1"
)

# averages replayed as exact integer micro-units with half-up
# rational rounding: p // q plus a remainder tie-adjust
# (2*(p%q) >= q), i.e. floor((2p+q)/(2q)) without doubling p so the
# int64 headroom of the sums is preserved — engine-independent where
# round(avg(double),6) ties at the 6th decimal depend on summation
# order (sf1 caught avg_price flipping a ...5-tie)
_SQL_TPCH_Q1 = """
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         cast(sum(cast(l_quantity as decimal(28,6))) * 1000000 as bigint) AS sum_qty_micros,
         cast(sum(cast(l_extendedprice as decimal(28,6))) * 1000000 as bigint) AS sum_base_price_micros,
         cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(28,6))) * 1000000 as bigint) AS sum_disc_price_micros,
         cast(sum(cast(l_extendedprice * (1 - l_discount) * (1 + l_tax) as decimal(28,6))) * 1000000 as bigint) AS sum_charge_micros,
         cast(sum(cast(l_discount as decimal(28,6))) * 1000000 as bigint) AS sum_disc_micros,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
       sum_qty_micros, sum_base_price_micros,
       sum_disc_price_micros, sum_charge_micros,
       cast((sum_qty_micros // count_order)
            + (CASE WHEN 2 * (sum_qty_micros % count_order) >= count_order THEN 1 ELSE 0 END) AS double) / 1e6 AS avg_qty,
       cast((sum_base_price_micros // count_order)
            + (CASE WHEN 2 * (sum_base_price_micros % count_order) >= count_order THEN 1 ELSE 0 END) AS double) / 1e6 AS avg_price,
       cast((sum_disc_micros // count_order)
            + (CASE WHEN 2 * (sum_disc_micros % count_order) >= count_order THEN 1 ELSE 0 END) AS double) / 1e6 AS avg_disc,
       count_order
FROM s
"""

_SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(cast(sum(cast(l_extendedprice * (1 - l_discount)
                           as decimal(28,6))) as double), 6) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""

_SQL_LAG_MATRIX = """
WITH w AS (
  SELECT user_id, ts, value,
         lag(value, 1) OVER win AS lag1,
         lag(value, 2) OVER win AS lag2,
         lag(value, 3) OVER win AS lag3,
         lead(value, 1) OVER win AS lead1
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts)
)
SELECT * FROM w
WHERE lag1 IS NOT NULL AND lag2 IS NOT NULL AND lag3 IS NOT NULL AND lead1 IS NOT NULL
"""

_SQL_DIFFERENCE = """
WITH d1 AS (
  SELECT user_id, ts,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS v
  FROM events
), d1f AS (SELECT * FROM d1 WHERE v IS NOT NULL),
d2 AS (
  SELECT user_id, ts,
         v - lag(v) OVER (PARTITION BY user_id ORDER BY ts) AS v
  FROM d1f
)
SELECT user_id, ts, round(v, 6) AS diff2_value FROM d2 WHERE v IS NOT NULL
"""

_SQL_CUMSUM = """
SELECT user_id, ts,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
FROM events
"""

_SQL_ROLLING = """
SELECT user_id, ts,
       round(avg(value) OVER win, 6) AS roll_mean,
       round(stddev_samp(value) OVER win, 6) AS roll_std
FROM events
WINDOW win AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""

_SQL_CALENDAR = """
SELECT o_orderkey,
       cast(hour(o_orderdate) as int) AS hour,
       cast(isodow(o_orderdate) - 1 as int) AS dow_mon0,
       cast(quarter(o_orderdate) as int) AS quarter,
       cast(month(o_orderdate) as int) AS month,
       cast(year(o_orderdate) as int) AS year,
       cast(dayofyear(o_orderdate) as int) AS dayofyear,
       cast(dayofmonth(o_orderdate) as int) AS dayofmonth,
       cast(weekofyear(o_orderdate) as int) AS weekofyear,
       cast(CASE WHEN isodow(o_orderdate) - 1 IN (5, 6) THEN 1 ELSE 0 END as int) AS weekend
FROM orders
"""

_SQL_FREQ = """
WITH t2 AS (
  SELECT ts FROM events ORDER BY ts LIMIT 2
), d AS (
  SELECT cast(floor(epoch(max(ts))) as bigint) - cast(floor(epoch(min(ts))) as bigint) AS delta_s FROM t2
), f AS (
  SELECT delta_s,
         CASE WHEN delta_s < 60 THEN 'seconds'
              WHEN delta_s < 3600 THEN 'minutes'
              WHEN delta_s < 86400 THEN 'hours'
              WHEN delta_s < 604800 THEN 'days'
              WHEN delta_s < 2419200 THEN 'weeks'
              WHEN delta_s < 7689600 THEN 'months'
              WHEN delta_s < 15379200 THEN 'quarters'
              WHEN delta_s < 31104000 THEN 'semi'
              ELSE 'years' END AS freq
  FROM d
)
SELECT delta_s, freq,
       cast(CASE freq WHEN 'months' THEN 12 WHEN 'days' THEN 30 WHEN 'weeks' THEN 52
                 WHEN 'quarters' THEN 4 WHEN 'semi' THEN 2 WHEN 'hours' THEN 24
                 WHEN 'minutes' THEN 60 WHEN 'seconds' THEN 60 ELSE 1 END as int) AS seasonal_period
FROM f
"""

_SQL_FUTURE_INDEX = """
SELECT '0' AS series_id,
       unnest(generate_series(mx + INTERVAL 1 DAY, mx + 8 * INTERVAL 1 DAY, INTERVAL 1 DAY)) AS ts
FROM (SELECT max(ts) AS mx FROM events)
"""

_SQL_EXPANDING_FOLDS = """
WITH numbered AS (
  SELECT value, row_number() OVER (ORDER BY event_id) AS rn, count(*) OVER () AS n
  FROM events
), folds AS (
  SELECT numbered.*, f.fold
  FROM numbered, (SELECT unnest(generate_series(0, 2)) AS fold) f
), roles AS (
  SELECT fold, rn, value,
         CASE WHEN rn <= n - (3 - fold) * 100 THEN 'train'
              WHEN rn <= n - (3 - fold) * 100 + 100 THEN 'test' END AS role
  FROM folds
)
SELECT fold, role, count(*) AS n, min(rn) AS min_rn, max(rn) AS max_rn,
       round(cast(sum(cast(value as decimal(28,6))) as double), 6) AS sum_value
FROM roles WHERE role IS NOT NULL
GROUP BY fold, role
"""

_SQL_SLIDING_FOLDS = """
WITH numbered AS (
  SELECT row_number() OVER (ORDER BY event_id) AS rn, count(*) OVER () AS n
  FROM events
), nf AS (
  SELECT *, least(cast(floor((n - 9200) / 300.0) as bigint) + 1, 1000) AS n_folds FROM numbered
), valid AS (SELECT * FROM nf WHERE n_folds >= 1),
folds AS (
  SELECT valid.*, f.fold
  FROM valid, LATERAL (SELECT unnest(generate_series(0, cast(n_folds - 1 as bigint))) AS fold) f
), roles AS (
  SELECT fold, rn,
         CASE WHEN rn <= 9000 + fold * 300 THEN 'train'
              WHEN rn <= 9000 + fold * 300 + 200 THEN 'test' END AS role
  FROM folds
)
SELECT fold, role, count(*) AS n, min(rn) AS min_rn, max(rn) AS max_rn
FROM roles WHERE role IS NOT NULL
GROUP BY fold, role
"""

_SQL_NAIVE_METRICS = """
WITH lagged AS (
  SELECT event_type, value,
         lag(value) OVER (PARTITION BY event_type ORDER BY ts) AS yhat
  FROM events
), f AS (SELECT * FROM lagged WHERE yhat IS NOT NULL)
SELECT event_type,
       round(sqrt(avg(pow(value - yhat, 2))), 6) AS rmse,
       round(avg(abs(value - yhat)), 6) AS mae,
       round(avg(abs(CASE WHEN value = 0 THEN NULL ELSE (value - yhat) / value END)) * 100, 6) AS mape,
       round(sqrt(avg(pow(value - yhat, 2))) / stddev_samp(value), 6) AS normalized_rmse
FROM f
GROUP BY event_type
"""

_SQL_WEIGHTED_CV = """
WITH lagged AS (
  SELECT event_id, value,
         lag(value) OVER (ORDER BY event_id) AS yhat
  FROM events
), f AS (SELECT * FROM lagged WHERE yhat IS NOT NULL),
numbered AS (
  SELECT *, row_number() OVER (ORDER BY event_id) AS rn, count(*) OVER () AS n FROM f
), folds AS (
  SELECT numbered.*, fo.fold
  FROM numbered, (SELECT unnest(generate_series(0, 4)) AS fold) fo
), test_rows AS (
  SELECT fold, value, yhat FROM folds
  WHERE rn > n - (5 - fold) * 100 AND rn <= n - (5 - fold) * 100 + 100
), per_fold AS (
  SELECT fold, sqrt(avg(pow(value - yhat, 2))) AS rmse FROM test_rows GROUP BY fold
)
SELECT round(sum(rmse * (fold + 1)) / sum(fold + 1), 6) AS weighted_rmse,
       count(*) AS n_folds
FROM per_fold
"""

_SQL_COLUMN_PROFILE = """
SELECT 'c_custkey' AS "column", cast(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, count(DISTINCT c_custkey) AS n_distinct FROM customer
UNION ALL
SELECT 'c_name', cast(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT c_name) FROM customer
UNION ALL
SELECT 'c_nationkey', cast(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT c_nationkey) FROM customer
UNION ALL
SELECT 'c_acctbal', cast(sum(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT c_acctbal) FROM customer
UNION ALL
SELECT 'c_mktsegment', cast(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END) AS BIGINT), count(DISTINCT c_mktsegment) FROM customer
"""

_SQL_FREQ_TABLE = """
SELECT event_type, count(*) AS cnt FROM events
GROUP BY event_type ORDER BY cnt DESC, event_type LIMIT 3
"""

_SQL_CLASS_WEIGHTS = """
WITH counts AS (
  SELECT o_orderstatus, count(*) AS cnt FROM orders GROUP BY o_orderstatus
), tot AS (SELECT sum(cnt) AS n, count(*) AS k FROM counts)
SELECT o_orderstatus, cnt, round(n / (k * cnt), 6) AS weight
FROM counts, tot
"""

# Overlapping token-window chunking (r12): same window arithmetic as
# chunk_documents — chunk k covers tokens [k*stride+1, k*stride+chunk]
# (1-based, DuckDB list slices are inclusive and clamp at the list
# end), n_chunks = 1 + (max(0, n-chunk) + stride-1) // stride, empty
# docs dropped. chunk=32, stride=24 per q_doc_chunks.
_SQL_DOC_CHUNKS = f"""
WITH lists AS (
  SELECT doc_id, list_filter({_SQL_TOKS}, t -> t <> '') AS l FROM documents
), sized AS (
  SELECT doc_id, l, len(l) AS n FROM lists WHERE len(l) > 0
), ks AS (
  SELECT doc_id, l, n,
         unnest(generate_series(0, (greatest(0, n - 32) + 23) // 24)) AS k
  FROM sized
)
SELECT doc_id,
       cast(k AS BIGINT) AS chunk_id,
       cast(least(32, n - k * 24) AS BIGINT) AS n_tokens,
       array_to_string(l[k * 24 + 1 : k * 24 + 32], ' ') AS chunk_text
FROM ks
"""

_SQL_TOKEN_EXPLODE = f"""
WITH toks AS (SELECT unnest({_SQL_TOKS}) AS token FROM documents)
SELECT token, count(*) AS cnt FROM toks
GROUP BY token ORDER BY cnt DESC, token LIMIT 20
"""

_SQL_REPETITION_PROFILE = f"""
WITH lists AS (
  SELECT doc_id, {_SQL_TOKS} AS l FROM documents
), toks AS (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok FROM lists
), grams AS (
  SELECT doc_id, tok AS g1,
         tok || ' ' || lead(tok) OVER w AS g2,
         tok || ' ' || lead(tok) OVER w || ' ' || lead(tok, 2) OVER w AS g3
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
), s1 AS (
  SELECT doc_id, cast(sum(c) AS BIGINT) AS total1, max(c) AS max1
  FROM (SELECT doc_id, g1, count(*) AS c FROM grams GROUP BY 1, 2) GROUP BY 1
), s2 AS (
  SELECT doc_id, sum(c) AS total2, max(c) AS max2
  FROM (SELECT doc_id, g2, count(*) AS c FROM grams WHERE g2 IS NOT NULL
        GROUP BY 1, 2) GROUP BY 1
), s3 AS (
  SELECT doc_id, sum(c) AS total3, count(*) AS distinct3
  FROM (SELECT doc_id, g3, count(*) AS c FROM grams WHERE g3 IS NOT NULL
        GROUP BY 1, 2) GROUP BY 1
)
SELECT s1.doc_id, total1 AS n_tokens,
       coalesce(round(max1 / total1, 6), 0.0) AS top_unigram_frac,
       coalesce(round(max2 / total2, 6), 0.0) AS top_bigram_frac,
       coalesce(round(1 - distinct3 / total3, 6), 0.0) AS dup_trigram_frac
FROM s1 LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
ORDER BY s1.doc_id
"""

_SQL_ACTUAL_PRED_JOIN = """
WITH daily AS (
  SELECT date_trunc('day', ts) AS d,
         round(cast(sum(cast(value as decimal(28,6))) as double), 6) AS actual
  FROM events GROUP BY 1
), pred AS (
  SELECT d + INTERVAL 1 DAY AS d, actual AS yhat FROM daily
)
SELECT coalesce(daily.d, pred.d) AS d, daily.actual AS actual, pred.yhat AS yhat
FROM daily FULL OUTER JOIN pred ON daily.d = pred.d
"""

_SQL_TRAIN_TAIL_SPLICE = """
WITH numbered AS (
  SELECT event_id, value, row_number() OVER (ORDER BY event_id) AS rn FROM events
)
SELECT event_id, value, 'tail' AS origin, rn FROM numbered WHERE rn > 9795 AND rn <= 9800
UNION ALL
SELECT event_id, value, 'test' AS origin, rn FROM numbered WHERE rn > 9800
"""

_SQL_LEADERBOARD = """
WITH rolled AS (
  SELECT event_type, ts, value,
         avg(value) OVER (PARTITION BY event_type ORDER BY ts
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rm
  FROM events
), base AS (
  SELECT event_type, value,
         lag(value) OVER win AS naive,
         lag(rm) OVER win AS rollmean
  FROM rolled
  WINDOW win AS (PARTITION BY event_type ORDER BY ts)
), f AS (SELECT * FROM base WHERE naive IS NOT NULL AND rollmean IS NOT NULL),
long AS (
  SELECT event_type, value, 'naive_lag1' AS model, naive AS yhat FROM f
  UNION ALL
  SELECT event_type, value, 'rolling_mean4', rollmean FROM f
), per_type AS (
  SELECT model, event_type, sqrt(avg(pow(value - yhat, 2))) AS rmse
  FROM long GROUP BY model, event_type
), board AS (
  SELECT model, round(avg(rmse), 6) AS mean_rmse FROM per_type GROUP BY model
)
SELECT model, mean_rmse,
       cast(row_number() OVER (ORDER BY mean_rmse ASC, model) as bigint) AS rank,
       cast(CASE WHEN row_number() OVER (ORDER BY mean_rmse ASC, model) = 1 THEN 1 ELSE 0 END as int) AS is_best
FROM board
"""

_SQL_TOPK_SUPPLIERS = """
WITH rev AS (
  SELECT l_suppkey,
         round(cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(28,6))) as double), 6) AS revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
ORDER BY revenue DESC, s_suppkey LIMIT 10
"""

_SQL_TOP_CORR = """
SELECT p_brand, round(corr(l_quantity, l_extendedprice), 6) AS corr
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY corr DESC, p_brand LIMIT 5
"""

_SQL_MINMAX = """
SELECT round(min(l_quantity), 6) AS min_qty, round(max(l_quantity), 6) AS max_qty,
       round(min(l_extendedprice), 6) AS min_price, round(max(l_extendedprice), 6) AS max_price,
       min(l_linenumber) AS min_ln, max(l_linenumber) AS max_ln
FROM lineitem
"""

_SQL_TEXT_PROFILE = f"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars, {_SQL_TOKS} AS toks FROM documents
), s AS (
  SELECT doc_id, n_chars, cast(len(toks) as bigint) AS n_tokens,
         cast(len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) as bigint) AS n_bpe_tokens,
         len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','for','it'], x)))
           / greatest(len(toks), 1) AS sw_ratio,
         length(regexp_replace(text, '[^!-/:-@\\[-`{{|}}~]', '', 'g')) / greatest(length(text), 1) AS punct_ratio,
         length(regexp_replace(text, '[^0-9]', '', 'g')) / greatest(length(text), 1) AS digit_ratio
  FROM t
)
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens,
       round(sw_ratio, 6) AS stopword_ratio,
       round((least(n_tokens / 100.0, 1.0) + least(sw_ratio * 5.0, 1.0)
            + greatest(1.0 - punct_ratio * 4.0, 0.0) + greatest(1.0 - digit_ratio * 4.0, 0.0)) / 4.0 * 1000000) / 1000000 AS quality
FROM s
"""

def _sql_quality_filter() -> str:
    from auto_ts_spark.operators.textops import QUALITY_RULES

    cases = []
    for name, lo, hi in QUALITY_RULES:
        conds = []
        if lo is not None:
            conds.append(f"{name} < {lo}")
        if hi is not None:
            conds.append(f"{name} > {hi}")
        cases.append(f"CASE WHEN {' OR '.join(conds)} THEN '{name}' END")
    case_list = ", ".join(cases)
    return f"""
WITH t AS (
  SELECT doc_id, text, length(text) AS n_chars, {_SQL_TOKS} AS toks FROM documents
), m AS (
  SELECT doc_id, n_chars,
         cast(len(toks) as bigint) AS n_tokens,
         round(list_sum(list_transform(toks, x -> cast(length(x) as double)))
               / greatest(len(toks), 1), 6) AS mean_word_len,
         round(len(list_filter(toks, x -> list_contains(['the','and','of','to','a','in','is','that','for','it'], x)))
               / greatest(len(toks), 1), 6) AS stopword_ratio,
         round(length(regexp_replace(text, '[^!-/:-@\\[-`{{|}}~]', '', 'g'))
               / greatest(length(text), 1), 6) AS punct_ratio,
         round(length(regexp_replace(text, '[^0-9]', '', 'g'))
               / greatest(length(text), 1), 6) AS digit_ratio
  FROM t
), r AS (
  SELECT doc_id, n_chars,
         CASE WHEN n_chars IS NULL THEN ['null_text']
              ELSE list_sort(list_filter([{case_list}], x -> x IS NOT NULL))
         END AS fr
  FROM m
)
SELECT doc_id, len(fr) = 0 AS keep,
       -- DuckDB's array_to_string returns NULL for an empty list
       -- (Spark's array_join returns ''): coalesce to match
       coalesce(array_to_string(fr, ','), '') AS reasons
FROM r ORDER BY doc_id
"""

_SQL_QUALITY_FILTER = _sql_quality_filter()

_SQL_CORPUS_VOCAB = f"""
WITH t AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
), f AS (
  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
  FROM t WHERE term <> '' GROUP BY term
), n AS (
  SELECT count(*) AS nd FROM documents
)
SELECT term, tf, df, round(ln((nd + 1) / (df + 1)) + 1, 6) AS idf
FROM f, n WHERE df >= 2
"""

_SQL_DATASET_SPLIT = f"""
WITH h AS (
  SELECT doc_id,
         {_sql_hash60("concat(cast(doc_id as varchar), ':42')")} % 1000000 AS b
  FROM documents
)
SELECT doc_id,
       CASE WHEN b < 800000 THEN 'train'
            WHEN b < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM h
"""

_SQL_MIXTURE_SAMPLE = f"""
WITH h AS (
  SELECT doc_id, source,
         {_sql_hash60("concat(cast(doc_id as varchar), ':42')")} % 1000000 AS b,
         CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                     WHEN 'src2' THEN 1.0 ELSE 0.0 END AS r
  FROM documents
), copies AS (
  SELECT doc_id, source,
         cast(floor(r) AS int)
         + CASE WHEN b < round((r - floor(r)) * 1000000) THEN 1 ELSE 0 END
           AS n_copies
  FROM h
)
SELECT source, cast(sum(n_copies) AS bigint) AS n_rows,
       cast(count(*) AS bigint) AS n_docs
FROM copies WHERE n_copies > 0
GROUP BY source ORDER BY source
"""

_SQL_BUDGET_SELECT = f"""
WITH t AS (
  SELECT doc_id, source, n_chars,
         coalesce(len({_SQL_TOKS}), 0) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY n_chars DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source FROM c WHERE cum <= 500 ORDER BY doc_id
"""

_SQL_LANG_PROFILE_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in TX.LANG_PROFILES.items() for w in ws
)

_SQL_LANGUAGE_ID = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents
), profiles(lang, word) AS (VALUES {_SQL_LANG_PROFILE_VALUES}),
hits AS (
  SELECT doc_id, lang, count(*) AS hits
  FROM toks JOIN profiles USING (word) GROUP BY doc_id, lang
), best AS (
  SELECT doc_id, max(hits) AS max_hits FROM hits GROUP BY doc_id
), pred AS (
  SELECT h.doc_id, min(h.lang) AS pred_lang, max(h.hits) AS hits
  FROM hits h JOIN best b ON h.doc_id = b.doc_id AND h.hits = b.max_hits
  GROUP BY h.doc_id
), all_docs AS (
  SELECT d.doc_id, coalesce(p.pred_lang, 'und') AS pred_lang, coalesce(p.hits, 0) AS hits
  FROM documents d LEFT JOIN pred p ON d.doc_id = p.doc_id
)
SELECT pred_lang, count(*) AS n_docs, cast(sum(hits) AS BIGINT) AS total_hits
FROM all_docs GROUP BY pred_lang
"""

_SQL_EXACT_DEDUP = f"""
WITH fp AS (
  SELECT {_sql_hash60("trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))")} AS fp
  FROM documents
), groups AS (SELECT fp, count(*) AS n FROM fp GROUP BY fp)
SELECT cast(sum(n) AS BIGINT) AS n_docs, count(*) AS n_distinct,
       cast(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
FROM groups
"""

# Mirrors auto_ts_spark.functions.text.shingles(): docs with fewer than
# n tokens fall back to ONE whole-text shingle on BOTH engines. ONE
# generator serves every oracle that shingles (Jaccard, minhash,
# winnow, decontaminate) so a tokenizer/shingle convention change
# cannot silently diverge across them.
def _sql_shingles(n: int, distinct: bool = True) -> str:
    zips = ", ".join(["toks"] + [f"toks[{i}:]" for i in range(2, n + 1)])
    cat = ", ' ', ".join(f"x[{i}]" for i in range(1, n + 1))
    inner = (
        f"list_filter(list_transform(list_zip({zips}),\n"
        f"      x -> CASE WHEN x[{n}] IS NOT NULL THEN concat({cat}) END),\n"
        f"      s -> s IS NOT NULL)"
    )
    if distinct:
        inner = f"list_distinct({inner})"
    return (
        f"CASE WHEN len(toks) < {n} THEN [array_to_string(toks, ' ')]\n"
        f"    ELSE {inner} END"
    )

# The tokenized-documents base CTE body shared by every shingling
# oracle (Jaccard, MinHash, SimHash, winnowing) — change the
# tokenizer convention in ONE place or not at all.
def _sql_tok_base(pred: str = "") -> str:
    where = f" WHERE {pred}" if pred else ""
    return "SELECT doc_id AS id, " + _SQL_TOKS + " AS toks FROM documents" + where

_SQL_NGRAM_JACCARD = f"""
WITH base AS (
  {_sql_tok_base()}
), sh AS (
  -- distinct 60-bit shingle hashes, mirroring the Spark operator's
  -- r13 narrow-join form (same md5-derived hash60 on both engines)
  SELECT id,
         list_distinct(list_transform({_sql_shingles(3, distinct=False)},
                                      s -> {_sql_hash60("s")})) AS sh,
         cast(len(toks) // 16 as int) AS lb
  FROM base
), inv AS (
  SELECT id, len(sh) AS n_sh, lb, unnest(sh) AS shingle FROM sh
), inter AS (
  -- inverted-index set-similarity join (mirrors the Spark operator):
  -- pairs sharing zero shingles have Jaccard 0 and are exactly prunable
  SELECT a.id AS id_a, b.id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b,
         count(*) AS c
  FROM inv a JOIN inv b
    ON a.shingle = b.shingle AND a.id < b.id
   AND b.lb BETWEEN a.lb - 1 AND a.lb + 1
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(c / greatest(n_a + n_b - c, 1), 6) AS jaccard
FROM inter WHERE round(c / greatest(n_a + n_b - c, 1), 6) >= 0.4
"""

def _sql_minhash_lsh(pred: str = "") -> str:
    """MinHash(16)+LSH(8 bands) oracle, optionally restricted by a
    deterministic predicate on documents (the bounded-subset form that
    keeps the sf10 parity sweep to minutes — pair work is quadratic in
    candidate-bucket size, so an id cap bounds it at any sf)."""
    where = f" WHERE {pred}" if pred else ""
    return f"""
WITH base AS (
  {_sql_tok_base(pred)}
), sh AS (
  SELECT id, {_sql_shingles(3, distinct=False)} AS sh_all
  FROM base
), based AS (
  -- verify set = DISTINCT 60-bit shingle hashes, mirroring the Spark
  -- operator's r13 narrow-shuffle form (same md5-derived hash60 on
  -- both engines, so candidate set and jaccard are engine-identical)
  SELECT id, list_distinct(list_transform(sh_all, s -> {_sql_hash60("s")})) AS sh,
         list_transform(sh_all, s -> {_sql_hash60("s")}) AS base FROM sh
), sig AS (
  SELECT id, sh,
         list_transform(generate_series(0, 15),
            i -> list_min(list_transform(base,
                 h -> ((2*i + 1) * (h % 2147483647) + (i * 2654435761 + 987654321) % 2147483647) % 2147483647))) AS mh
  FROM based
), banded AS (
  SELECT id, sh, b.band,
         array_to_string(mh[b.band * 2 + 1 : b.band * 2 + 2], ',') AS bh
  FROM sig, (SELECT unnest(generate_series(0, 7)) AS band) b
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
), scored AS (
  SELECT id_a, id_b,
         round(len(list_intersect(sh_a, sh_b))
               / greatest(len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b)), 1), 6) AS jaccard
  FROM cand
)
SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.4
"""

_SQL_MINHASH_LSH = _sql_minhash_lsh()

# Bounded-subset slice (r7): doc_id < 5000 applied identically in
# Spark and SQL. At the driver's sf0.01 (500 docs) the slice IS the
# full table, so the driver row carries the same signal as the
# unbounded query; at sf10 (500k docs) it caps the quadratic oracle
# at 5k docs so the full-board parity sweep stays minutes, not hours.
_SLICE_DOC_PRED = "doc_id < 5000"

_SQL_MINHASH_LSH_SLICE = _sql_minhash_lsh(_SLICE_DOC_PRED)

def _sql_dedup_clusters(pred: str = "") -> str:
    """Recursive-CTE components over the (optionally bounded) MinHash
    pair graph — the parameterization that makes the sf10 sweep
    tractable (see _sql_minhash_lsh)."""
    return f"""
WITH RECURSIVE pr AS (
  SELECT id_a, id_b FROM ({_sql_minhash_lsh(pred)}) t
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pr
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pr
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach(id, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
), lab AS (
  SELECT id AS doc_id, min(root) AS cluster_id FROM reach GROUP BY id
)
SELECT doc_id, cluster_id,
       cast(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       doc_id = cluster_id AS is_keep
FROM lab
"""

_SQL_DEDUP_CLUSTERS = _sql_dedup_clusters()

_SQL_DEDUP_CLUSTERS_SLICE = _sql_dedup_clusters(_SLICE_DOC_PRED)

_SQL_SIMHASH = f"""
WITH t AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents WHERE doc_id < 100
), h AS (
  SELECT doc_id, toks,
         list_transform(toks, tk -> {_sql_hash60("tk")}) AS hs
  FROM t
)
SELECT doc_id,
       cast(list_aggregate(
         list_transform(generate_series(0, 31),
           b -> CASE WHEN 2 * len(list_filter(hs, hh -> (hh >> b) & 1 = 1)) > len(toks)
                     THEN (1::BIGINT << b) ELSE 0::BIGINT END),
         'sum') AS BIGINT) AS simhash
FROM h
"""

_SQL_WINNOW_OVERLAP = f"""
WITH base AS (
  {_sql_tok_base()}
), sh AS (
  SELECT id, {_sql_shingles(4, distinct=False)} AS sh
  FROM base
), hashed AS (
  SELECT id, list_transform(sh, s -> {_sql_hash60("s")}) AS hs FROM sh
), fps AS (
  SELECT id, unnest(list_distinct(list_transform(
           generate_series(1, len(hs)), i -> list_min(hs[i : i + 3])))) AS fp
  FROM hashed
), rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING count(DISTINCT id) <= 20
), pruned AS (
  SELECT fps.id, fps.fp FROM fps JOIN rare USING (fp)
)
SELECT a.id AS id_a, b.id AS id_b, cast(count(DISTINCT a.fp) AS bigint) AS n_shared
FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2 HAVING count(DISTINCT a.fp) >= 2
ORDER BY id_a, id_b
"""

_SQL_DECONTAMINATE = f"""
WITH base AS (
  {_sql_tok_base()}
), sh AS (
  SELECT id, {_sql_shingles(4, distinct=False)} AS sh
  FROM base
), grams AS (
  -- empty grams dropped (operators/decontam.py::_doc_ngrams)
  SELECT id, gram
  FROM (SELECT id, unnest(list_distinct(sh)) AS gram FROM sh)
  WHERE gram <> ''
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE id % 53 = 0
), corp AS (
  SELECT id, gram FROM grams WHERE id % 53 <> 0
)
SELECT corp.id AS doc_id, cast(count(*) AS bigint) AS n_hits,
       min(corp.gram) AS first_gram
FROM corp JOIN bench USING (gram)
GROUP BY 1 ORDER BY doc_id
"""

def _sql_pii_redaction() -> str:
    from auto_ts_spark.operators.pii import pii_oracle_sql_exprs

    count_cols, redacted = pii_oracle_sql_exprs()
    return f"""
WITH corpus AS (
  SELECT c_custkey AS custkey,
    'Reach ' || c_name || ' at user' || c_custkey::varchar ||
    '@example.com, call 555-' ||
    lpad((c_custkey % 1000)::varchar, 3, '0') || '-' ||
    lpad((c_custkey % 10000)::varchar, 4, '0') ||
    ' or ping 10.' || (c_custkey % 200)::varchar || '.' ||
    (c_nationkey % 250)::varchar || '.' || ((c_custkey * 7) % 250)::varchar ||
    CASE WHEN c_custkey % 3 = 0 THEN ' SSN 123-45-6789 on file.' ELSE '' END ||
    CASE WHEN c_custkey % 5 = 0 THEN ' Card 4242 4242 4242 4242 expired.'
         ELSE '' END AS txt
  FROM customer
)
SELECT custkey, {count_cols}, {redacted} AS redacted
FROM corpus ORDER BY custkey
"""

_SQL_PII_REDACTION = _sql_pii_redaction()

# html_extract: the Spark side synthesizes an HTML page per customer
# row (script/style/noscript/template subtrees, comments, named +
# decimal + hex entities, nested inline tags, a void <br/>) and runs
# the real markup parser; the oracle constructs the EXPECTED visible
# text directly from the same base columns — extract(synthesize(x))
# must equal expected(x), the pii_redaction fixture pattern.
_SQL_HTML_EXTRACT = """
WITH pages AS (
  SELECT c_custkey AS custkey,
    'Profile ' || c_custkey::varchar
    || chr(10) || 'Customer ' || c_name
    || chr(10) || 'Segment & flag: ' || c_mktsegment || ' ' || chr(8212)
    || ' nation ' || c_nationkey::varchar
    || chr(10) || 'Phone: 555-' || lpad((c_custkey % 10000)::varchar, 4, '0')
    || chr(10) || 'Key: ' || c_custkey::varchar
    || chr(10) || 'alpha ' || c_custkey::varchar
    || chr(10) || 'beta ' || (c_custkey * 3)::varchar AS text
  FROM customer
)
SELECT custkey,
       cast(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       text
FROM pages ORDER BY custkey
"""

_SQL_DOMAIN_DOC_COUNTS = """
WITH corpus AS (
  SELECT
    'Buy ' || p_name || ' at https://shop' || (p_partkey % 7)::varchar ||
    '.example' || CASE WHEN p_partkey % 2 = 0 THEN '.com' ELSE '.org' END ||
    '/item/' || p_partkey::varchar ||
    ' or https://cdn.assets' || (p_partkey % 3)::varchar ||
    '.example.com/img/' || p_partkey::varchar || '.png today' AS txt
  FROM part
), doms AS (
  SELECT unnest(list_distinct(list_transform(
           regexp_extract_all(txt, '{url_pat}'),
           u -> lower(regexp_extract(u, '{host_pat}', 1))
         ))) AS domain
  FROM corpus
)
SELECT domain, cast(count(*) AS bigint) AS n_docs
FROM doms GROUP BY domain ORDER BY domain
"""

def _sql_domain_doc_counts() -> str:
    from auto_ts_spark.operators.urls import HOST_PATTERN, URL_PATTERN

    # single quotes inside the pattern's character class must be
    # doubled inside a SQL string literal; both patterns come from the
    # operator's own constants so the engines cannot drift
    return _SQL_DOMAIN_DOC_COUNTS.replace(
        "{url_pat}", URL_PATTERN.replace("'", "''")
    ).replace("{host_pat}", HOST_PATTERN.replace("'", "''"))

_SQL_DOMAIN_DOC_COUNTS = _sql_domain_doc_counts()

_SQL_EMBEDDING_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, cast(embedding as double[]) AS qv FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, cast(embedding as double[]) AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM c, q WHERE neighbor_id <> query_id
), ranked AS (
  SELECT *, cast(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) as int) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
"""

def _sql_embedding_near_dup(pred: str = "") -> str:
    """Label-blocked cosine near-dup oracle, optionally bounded by a
    deterministic vec_id predicate (sf10-sweepable form)."""
    where = f" WHERE {pred}" if pred else ""
    return f"""
WITH v AS (SELECT label, vec_id, cast(embedding as double[]) AS ve FROM embeddings{where})
SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.ve, b.ve) /
             (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 6) AS cosine
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.ve, b.ve) /
      (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))) >= 0.2999995
  AND round(list_dot_product(a.ve, b.ve) /
      (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3
"""

_SQL_EMBEDDING_NEAR_DUP = _sql_embedding_near_dup()

# vec_id < 2000 ≈ the whole table at the driver's sf0.01 (~800
# vectors) but caps the label-blocked quadratic at 2k vectors at any
# larger sf — the sweepable twin of embedding_near_dup.
_SLICE_VEC_PRED = "vec_id < 2000"

_SQL_EMBEDDING_NEAR_DUP_SLICE = _sql_embedding_near_dup(_SLICE_VEC_PRED)

_SQL_SEMANTIC_DEDUP_IVF = """
SELECT cast(vec_id AS bigint) AS src_id,
       cast(2 AS bigint) AS n_copies,
       cast(2 AS bigint) AS copies_with_src,
       cast(0 AS bigint) AS copies_kept
FROM embeddings WHERE vec_id < 20
"""

_SQL_SEMANTIC_DEDUP = """
WITH RECURSIVE v AS (
  SELECT label, vec_id, cast(embedding as double[]) AS ve FROM embeddings
), pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.ve, b.ve) /
        (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))) >= 0.2999995
    AND round(list_dot_product(a.ve, b.ve) /
        (sqrt(list_dot_product(a.ve, a.ve)) * sqrt(list_dot_product(b.ve, b.ve))), 6) >= 0.3
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pr
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pr
), nodes AS (
  SELECT DISTINCT src AS id FROM edges
), reach(id, root) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
), lab AS (
  SELECT id AS vec_id, min(root) AS cluster_id FROM reach GROUP BY id
)
SELECT vec_id, cluster_id,
       cast(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       vec_id = cluster_id AS is_keep
FROM lab
"""

_SQL_DSIR_WEIGHTS = f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS tk FROM documents
), grams AS (
  SELECT doc_id, unnest(tk) AS g FROM toks
  UNION ALL
  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                       i -> tk[i] || ' ' || tk[i + 1])) AS g
  FROM toks
), rawb AS (
  SELECT doc_id, {_sql_hash60("g")} % 256 AS bucket FROM grams
), tgtb AS (
  SELECT bucket FROM rawb JOIN documents USING (doc_id) WHERE lang = 'en'
), rc AS (
  SELECT bucket, count(*) AS cnt_r FROM rawb GROUP BY bucket
), tc AS (
  SELECT bucket, count(*) AS cnt_t FROM tgtb GROUP BY bucket
), tot AS (
  SELECT (SELECT count(*) FROM rawb) AS tr, (SELECT count(*) FROM tgtb) AS tt
), lnr AS (
  SELECT coalesce(rc.bucket, tc.bucket) AS bucket,
         cast(round(ln(((coalesce(cnt_t, 0) + 1.0) / (tt + 256.0))
                       / ((coalesce(cnt_r, 0) + 1.0) / (tr + 256.0))), 9)
              as decimal(28,9)) AS lnr
  FROM rc FULL JOIN tc ON rc.bucket = tc.bucket, tot
)
SELECT doc_id, count(*) AS n_grams,
       cast(round(sum(lnr), 6) as double) AS log_weight
FROM rawb JOIN lnr USING (bucket)
GROUP BY doc_id
"""

# stupid-backoff bigram LM over the en reference; per-token branches:
# first token → smoothed unigram; seen bigram → conditional MLE;
# else → alpha(0.4)-discounted smoothed unigram (OOV included via the
# V+1-class add-one smoothing)
_SQL_LM_SCORED = f"""
WITH t AS (
  SELECT doc_id, list_filter({_SQL_TOKS}, x -> x <> '') AS tk
  FROM documents WHERE text IS NOT NULL
), ref AS (
  SELECT t.tk FROM t JOIN documents USING (doc_id) WHERE lang = 'en'
), uni AS (
  SELECT w, count(*) AS c1 FROM (SELECT unnest(tk) AS w FROM ref) GROUP BY w
), tot AS (
  SELECT cast(sum(c1) + count(*) + 1 AS double) AS nv1 FROM uni
), bi AS (
  SELECT big, count(*) AS c2
  FROM (SELECT unnest(list_transform(range(1, len(tk)),
                                     i -> tk[i] || ' ' || tk[i + 1])) AS big
        FROM ref)
  GROUP BY big
), bi2 AS (
  SELECT big, c2, c1 AS c1_prev
  FROM bi JOIN uni ON string_split(big, ' ')[1] = w
), pos AS (
  SELECT doc_id, tk[i] AS cur,
         CASE WHEN i = 1 THEN NULL ELSE tk[i - 1] END AS prev
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM t)
), lp AS (
  SELECT doc_id,
         cast(round(CASE
           WHEN prev IS NULL
             THEN ln((coalesce(c1, 0) + 1.0) / nv1)
           WHEN c2 IS NOT NULL THEN ln(c2 / c1_prev)
           ELSE ln(0.4) + ln((coalesce(c1, 0) + 1.0) / nv1)
         END, 9) AS decimal(28,9)) AS lp9
  FROM pos
  LEFT JOIN uni ON pos.cur = uni.w
  LEFT JOIN bi2 ON pos.prev || ' ' || pos.cur = bi2.big
  CROSS JOIN tot
)
SELECT doc_id, count(*) AS n_tokens,
       cast(-round(sum(lp9), 6) AS double) AS nlp_sum,
       cast(-round(sum(lp9), 6) AS double) / count(*) AS avg_nlp
FROM lp GROUP BY doc_id
"""

def _sql_quality_classifier(n_buckets: int = 128, iters: int = 3) -> str:
    """Unrolled-training-loop oracle for q_quality_classifier (lr=1).

    Mirrors the operator op-for-op in micro-units: every sum is
    bigint, every quantization is floor(x * 1e6 + 0.5) over the same
    IEEE double sequence the Spark side (and the driver's Python
    update step) executes."""
    u = "1000000.0"
    head = f"""
WITH t AS (
  SELECT doc_id AS id, list_filter({_SQL_TOKS}, x -> x <> '') AS tk
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT id, {_sql_hash60("w")} % {n_buckets} AS bucket
  FROM (SELECT id, unnest(tk) AS w FROM t)
), cnt AS (
  SELECT id, bucket, count(*) AS c FROM grams GROUP BY id, bucket
), tot AS (
  SELECT id, count(*) AS tc FROM grams GROUP BY id
), feats AS MATERIALIZED (
  SELECT id, bucket, cast(floor(c / tc * {u} + 0.5) AS bigint) AS x_u
  FROM cnt JOIN tot USING (id)
  UNION ALL
  SELECT id, -1 AS bucket, 1000000 AS x_u FROM tot
), lab AS MATERIALIZED (
  SELECT f.id, f.bucket, f.x_u,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM feats f JOIN documents d ON f.id = d.doc_id
), nn AS (
  SELECT count(DISTINCT id) AS n FROM lab
), w0 AS MATERIALIZED (
  SELECT unnest(range(-1, {n_buckets})) AS bucket, cast(0 AS bigint) AS w_u
)"""
    steps = []
    for i in range(iters):
        steps.append(f""", c{i} AS MATERIALIZED (
  SELECT id, bucket, x_u, y,
         cast(floor(cast(w_u AS double) * (cast(x_u AS double) / {u})
                    + 0.5) AS bigint) AS wx_u
  FROM lab JOIN w{i} USING (bucket)
), z{i} AS MATERIALIZED (
  SELECT id, y, sum(wx_u) AS z_u FROM c{i} GROUP BY id, y
), e{i} AS MATERIALIZED (
  SELECT id,
         cast(floor(1.0 / (1.0 + exp(-(cast(z_u AS double) / {u}))) * {u}
                    + 0.5) AS bigint) - y * 1000000 AS e_u
  FROM z{i}
), g{i} AS MATERIALIZED (
  SELECT bucket,
         sum(cast(floor((cast(x_u AS double) / {u})
                        * cast(e_u AS double) + 0.5) AS bigint)) AS g_u
  FROM c{i} JOIN e{i} USING (id) GROUP BY bucket
), w{i + 1} AS MATERIALIZED (
  SELECT w{i}.bucket,
         w{i}.w_u - cast(floor(1.0 * cast(coalesce(g.g_u, 0) AS double)
                               / nn.n + 0.5) AS bigint) AS w_u
  FROM w{i} LEFT JOIN g{i} g USING (bucket) CROSS JOIN nn
)""")
    tail = f""", sc AS (
  SELECT id,
         cast(floor(cast(w_u AS double) * (cast(x_u AS double) / {u})
                    + 0.5) AS bigint) AS wx_u
  FROM feats JOIN w{iters} USING (bucket)
), zz AS (
  SELECT id AS doc_id, cast(sum(wx_u) AS bigint) AS z_micro
  FROM sc GROUP BY id
), pp AS (
  SELECT doc_id, z_micro,
         cast(floor(1.0 / (1.0 + exp(-(cast(z_micro AS double) / {u})))
                    * {u} + 0.5) AS bigint) AS p_u
  FROM zz
)
SELECT doc_id, z_micro, cast(p_u AS double) / {u} AS p,
       p_u >= 500000 AS keep
FROM pp
"""
    return head + "".join(steps) + tail

_SQL_QUALITY_CLASSIFIER = _sql_quality_classifier()

_SQL_PERPLEXITY_BUCKETS = f"""
WITH scored AS ({_SQL_LM_SCORED}), r AS (
  SELECT avg_nlp, ntile(3) OVER (ORDER BY avg_nlp, doc_id) AS b FROM scored
)
SELECT CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       min(avg_nlp) AS min_avg_nlp, max(avg_nlp) AS max_avg_nlp
FROM r GROUP BY 1
"""

_SQL_REPEATED_SPAN_SCRUB = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
  FROM documents WHERE text IS NOT NULL
), spans AS (
  SELECT doc_id, unnest(range(1, greatest(len(tk) - 8 + 2, 1))) AS s FROM t
), fp AS (
  -- the operator's fingerprint (xxhash64 of the token slice) never
  -- surfaces in output, so the replay groups by the LITERAL window
  -- text — exact semantics, no cross-engine hash coupling
  SELECT spans.doc_id, s, array_to_string(tk[s:s+7], chr(30)) AS h
  FROM spans JOIN t USING (doc_id)
), dup AS (
  SELECT h FROM fp GROUP BY h HAVING count(distinct doc_id) >= 2
), cov AS (
  SELECT DISTINCT doc_id, u AS p
  FROM (SELECT doc_id, unnest(range(s, s + 8)) AS u
        FROM fp JOIN dup USING (h))
), pos AS (
  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS p FROM t
), kept AS (
  SELECT pos.doc_id, pos.p
  FROM pos LEFT JOIN cov ON pos.doc_id = cov.doc_id AND pos.p = cov.p
  WHERE cov.p IS NULL
), asm AS (
  SELECT kept.doc_id, string_agg(tk[p], ' ' ORDER BY p) AS clean_text,
         count(*) AS nk
  FROM kept JOIN t USING (doc_id) GROUP BY kept.doc_id
)
SELECT t.doc_id,
       coalesce(asm.clean_text, '') AS clean_text,
       cast(coalesce(asm.nk, 0) AS bigint) AS n_tokens_kept,
       cast(len(tk) - coalesce(asm.nk, 0) AS bigint) AS n_tokens_removed
FROM t LEFT JOIN asm ON t.doc_id = asm.doc_id
"""

_SQL_HOURLY_ROLLUP = """
SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
       round(cast(sum(cast(value as decimal(28,6))) as double), 6) AS sum_value
FROM events GROUP BY 1, 2
"""

_SQL_STREAMING_HOURLY_ROLLUP = """
SELECT date_trunc('hour', ts) AS win_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
       event_type,
       count(*) AS n_events,
       round(cast(sum(cast(value as decimal(28,6))) as double), 6) AS sum_value,
       cast(sum(cast(value as decimal(28,6))) * 1000000 AS BIGINT)
           // count(*) AS avg_value_micros
FROM events GROUP BY 1, 2, 3
"""

_SQL_STREAMING_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER win IS NULL THEN 1
              WHEN epoch(ts) - epoch(lag(ts) OVER win) >= 1800.0 THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       count(*) AS n_events,
       round(cast(sum(cast(value AS decimal(28,6))) AS double), 6) AS sum_value
FROM sess GROUP BY user_id, sid
"""

_SQL_STREAMING_SLIDING_ROLLUP = """
WITH exploded AS (
  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000
                        - k * 900000000) AS win_start,
         event_type, value
  FROM events, (SELECT unnest(generate_series(0, 3)) AS k)
)
SELECT win_start,
       win_start + INTERVAL 1 HOUR AS win_end,
       event_type,
       count(*) AS n_events,
       round(cast(sum(cast(value AS decimal(28,6))) AS double), 6) AS sum_value,
       cast(sum(cast(value AS decimal(28,6))) * 1000000 AS BIGINT)
           // count(*) AS avg_value_micros
FROM exploded GROUP BY 1, 2, 3
"""

_SQL_STREAMING_DEDUP = """
SELECT count(*) AS n_rows,
       count(DISTINCT event_id) AS n_keys,
       round(cast(sum(cast(value AS decimal(28,6))) AS double), 6) AS sum_value
FROM events
"""

# the recursive CTE replays stateful_rolling_forecast's fold verbatim:
# base case n=1 (mean = v, ewma = v), step n+1 joins the next row in
# (ts, event_id) order; (1 - 0.3) is written as the expression, not
# 0.7, because the two double literals differ in the last ulp
_SQL_STREAMING_FORECAST_STATE = """
WITH RECURSIVE bounded AS (
  SELECT * FROM (
    SELECT event_type AS series_id, CAST(value AS DOUBLE) AS v,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS rn
    FROM events WHERE event_id % 20 = 0 AND event_id < 100000)
), fold AS (
  SELECT series_id, rn, CAST(1 AS BIGINT) AS n, v AS mean, v AS ewma
  FROM bounded WHERE rn = 1
  UNION ALL
  SELECT b.series_id, b.rn, f.n + 1,
         f.mean + (b.v - f.mean) / (f.n + 1),
         0.3 * b.v + (1 - 0.3) * f.ewma
  FROM fold f JOIN bounded b
    ON b.series_id = f.series_id AND b.rn = f.rn + 1
), final AS (
  SELECT series_id, n, mean, ewma,
         row_number() OVER (PARTITION BY series_id ORDER BY n DESC) AS rk
  FROM fold
)
SELECT series_id,
       n AS running_n,
       round(mean, 6) AS running_mean,
       round(ewma, 6) AS ewma,
       round(ewma, 6) AS yhat_next
FROM final WHERE rk = 1
"""

_SQL_DEDUP_COLUMNS = """
SELECT event_type,
       round(cast(sum(cast(value AS decimal(28,6))) AS double), 6) AS sum_v,
       count(*) AS n
FROM events GROUP BY event_type
"""

_SQL_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER win IS NULL THEN 0
              WHEN cast(floor(epoch(ts)) as bigint) - cast(floor(epoch(lag(ts) OVER win)) as bigint) > 1800 THEN 1
              ELSE 0 END AS new_s
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         cast(floor(epoch(max(ts))) as bigint) - cast(floor(epoch(min(ts))) as bigint) AS duration_s
  FROM sess GROUP BY user_id, session_id
)
SELECT user_id, count(*) AS n_sessions,
       round(avg(n_events), 6) AS avg_events_per_session,
       round(avg(duration_s), 6) AS avg_session_duration_s
FROM per_session GROUP BY user_id
"""

_SQL_FILLNA_FFILL = """
WITH sparse AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
  FROM events
)
SELECT event_id, user_id,
       round(last_value(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
       cast(CASE WHEN value IS NULL THEN 1 ELSE 0 END as int) AS value_missing_flag
FROM sparse
"""

_SQL_JSON_PROPS = """
SELECT event_id,
       cast(json_extract(props, '$.k') as int) AS k,
       CASE WHEN cast(json_extract(props, '$.k') as int) % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
       round(ln(value + 1), 6) AS log_value,
       round(sqrt(abs(value)), 6) AS sqrt_abs_value
FROM events
"""

_SQL_ACF = """
WITH s AS (
  """ + _SQL_DAILY + """
), l AS (
  SELECT y,
         """ + ", ".join(f"lag(y,{k}) OVER (ORDER BY ts) AS l{k}" for k in range(1, 8)) + """
  FROM s
)
SELECT lag, round(acf, 6) AS acf FROM (
""" + " UNION ALL ".join(
    f"SELECT cast({k} AS int) AS lag, corr(y, l{k}) AS acf FROM l" for k in range(1, 8)
) + """
)
"""

# Single source of truth for the PACF depth — q_pacf and every clause
# of _SQL_PACF derive from it (changing one side can't break parity).
PACF_MAX_LAG = 7

_SQL_PACF = f"""
WITH RECURSIVE s AS (
  """ + _SQL_DAILY + """
), l AS (
  SELECT y, """ + ", ".join(
    f"lag(y,{k}) OVER (ORDER BY ts) AS l{k}" for k in range(1, PACF_MAX_LAG + 1)
) + """
  FROM s
), r AS (
  SELECT [1.0] || [""" + ", ".join(
    f"corr(y, l{k})" for k in range(1, PACF_MAX_LAG + 1)
) + f"""] AS rv FROM l
), dl(k, phi) AS (
  -- Durbin-Levinson: phi is the length-k coefficient vector phi_{{k,1..k}};
  -- rv is 1-indexed with rv[m+1] = r_m. The denominator guard mirrors
  -- the Spark side (operators/lags.py: den == 0 -> 0.0) so degenerate
  -- series agree instead of diverging to inf/NULL.
  SELECT 1, [rv[2]] FROM r
  UNION ALL
  SELECT k + 1, list_transform(phi, (p, j) -> p - a * phi[k + 1 - j]) || [a]
  FROM (
    SELECT k, phi,
      CASE WHEN (1 - list_sum(list_transform(phi, (p, j) -> p * rv[j+1]))) = 0
           THEN 0.0
           ELSE (rv[k+2] - list_sum(list_transform(phi, (p, j) -> p * rv[k+2-j])))
                / (1 - list_sum(list_transform(phi, (p, j) -> p * rv[j+1])))
      END AS a
    FROM dl, r WHERE k < {PACF_MAX_LAG}
  )
)
SELECT cast(k AS int) AS lag, round(phi[k], 6) AS pacf FROM dl ORDER BY k
"""

_SQL_ZERO_VARIANCE = """
WITH a AS (
  SELECT round(stddev_samp(value), 6) AS value,
         round(stddev_samp(year(ts)), 6) AS year,
         round(stddev_samp(month(ts)), 6) AS month,
         round(stddev_samp(1.0), 6) AS const_one
  FROM events
)
SELECT feature, stddev, stddev != 0 AS keep FROM (
  SELECT 'value' AS feature, value AS stddev FROM a
  UNION ALL SELECT 'year', year FROM a
  UNION ALL SELECT 'month', month FROM a
  UNION ALL SELECT 'const_one', const_one FROM a
)
"""

_SQL_PROBLEM_TYPE = """
SELECT 'value' AS target,
       CASE WHEN (SELECT count(DISTINCT value) FROM events) = 2
            THEN 'Binary_Classification' ELSE 'Regression' END AS problem_type
UNION ALL
SELECT 'event_type',
       CASE WHEN (SELECT count(DISTINCT event_type) FROM events) = 2
            THEN 'Binary_Classification' ELSE 'Multi_Classification' END
UNION ALL
SELECT 'user_id',
       CASE WHEN (SELECT count(DISTINCT user_id) FROM events) = 2
            THEN 'Binary_Classification'
            WHEN (SELECT count(DISTINCT user_id) FROM events) <= 30
            THEN 'Multi_Classification' ELSE 'Regression' END
"""

_SQL_LABEL_ENCODE = """
WITH m AS (
  SELECT value, row_number() OVER (ORDER BY value) - 1 AS code
  FROM (SELECT DISTINCT event_type AS value FROM events WHERE event_type <> 'error')
), mx AS (SELECT max(code) AS mc FROM m),
u AS (
  SELECT value, mc + row_number() OVER (ORDER BY value) AS code
  FROM (SELECT DISTINCT event_type AS value FROM events
        WHERE event_type NOT IN (SELECT value FROM m)) CROSS JOIN mx
)
SELECT e.event_type, cast(coalesce(m.code, u.code) AS bigint) AS code,
       count(*) AS n
FROM events e LEFT JOIN m ON e.event_type = m.value
              LEFT JOIN u ON e.event_type = u.value
GROUP BY 1, 2
"""

_SQL_FORECAST_VIZ_JOIN = """
WITH daily AS (
  """ + _SQL_DAILY + """
), fc AS (
  SELECT ts + INTERVAL 7 DAY AS ts, round(y, 6) AS yhat,
         round(y * 0.9, 6) AS yhat_lower, round(y * 1.1, 6) AS yhat_upper
  FROM daily
)
SELECT coalesce(d.ts, fc.ts) AS ts, round(d.y, 6) AS y,
       fc.yhat, fc.yhat_lower, fc.yhat_upper
FROM daily d FULL OUTER JOIN fc ON d.ts = fc.ts
"""

_SQL_REVENUE_ROLLUP = """
SELECT n_name, cast(year(o_orderdate) AS bigint) AS o_year,
       round(cast(sum(cast(o_totalprice AS decimal(20,2))) AS double), 2) AS revenue,
       count(*) AS n_orders,
       cast(grouping(n_name) AS int) AS g_nation,
       cast(grouping(year(o_orderdate)) AS int) AS g_year
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))
"""

_SQL_RESIDUAL_DIAG = """
WITH daily AS (
  """ + _SQL_DAILY + """
), e AS (
  SELECT ts, y - lag(y, 1) OVER (ORDER BY ts) AS e FROM daily
  QUALIFY e IS NOT NULL
), l AS (
  SELECT e,
         lag(e,1) OVER (ORDER BY ts) AS e1, lag(e,2) OVER (ORDER BY ts) AS e2,
         lag(e,3) OVER (ORDER BY ts) AS e3, lag(e,4) OVER (ORDER BY ts) AS e4,
         lag(e,5) OVER (ORDER BY ts) AS e5
  FROM e
), a AS (
  SELECT count(*) AS n,
         sum(pow(e - e1, 2)) AS num_dw,
         sum(pow(e, 2)) AS ss,
         avg(e) AS m1, avg(pow(e,2)) AS r2, avg(pow(e,3)) AS r3, avg(pow(e,4)) AS r4,
         sum(e * e1) AS s1, sum(e * e2) AS s2, sum(e * e3) AS s3,
         sum(e * e4) AS s4, sum(e * e5) AS s5
  FROM l
)
SELECT n AS n_resid,
       round(num_dw / ss, 6) AS durbin_watson,
       round(n / 6.0 * (pow((r3 - 3*m1*r2 + 2*pow(m1,3)) / pow(r2 - pow(m1,2), 1.5), 2)
             + pow((r4 - 4*m1*r3 + 6*pow(m1,2)*r2 - 3*pow(m1,4)) / pow(r2 - pow(m1,2), 2) - 3, 2) / 4.0), 6)
         AS jarque_bera,
       round(n * (n + 2) * (pow(s1/ss,2)/(n-1) + pow(s2/ss,2)/(n-2) + pow(s3/ss,2)/(n-3)
             + pow(s4/ss,2)/(n-4) + pow(s5/ss,2)/(n-5)), 6) AS ljung_box_q5,
       round(s1 / ss, 6) AS ar1_phi,
       abs(s1 / ss) < 1.0 AS ar_root_outside_unit_circle
FROM a
"""

_SQL_SEASONAL_DECOMPOSE = """
WITH s AS (
  """ + _SQL_DAILY + """
), t AS (
  SELECT ts, y,
         (row_number() OVER (ORDER BY ts) - 1) % 7 AS phase,
         CASE WHEN count(y) OVER (ORDER BY ts ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN avg(y) OVER (ORDER BY ts ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
         END AS trend
  FROM s
), pm AS (
  SELECT phase, avg(y - trend) AS pmv FROM t WHERE trend IS NOT NULL GROUP BY phase
), g AS (SELECT avg(pmv) AS gm FROM pm)
SELECT t.ts, round(t.y, 6) AS y, round(t.trend, 6) AS trend,
       round(pm.pmv - g.gm, 6) AS seasonal,
       round(t.y - t.trend - (pm.pmv - g.gm), 6) AS residual
FROM t LEFT JOIN pm ON t.phase = pm.phase CROSS JOIN g
"""

_SQL_QUANTILE_PROFILE = """
SELECT round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
       round(quantile_cont(l_extendedprice, 0.95), 6) AS p95,
       round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
FROM lineitem
"""

_SQL_ASOF_JOIN = """
SELECT l.user_id, l.ts, l.event_id,
       r.click_value AS click_value, r.ts AS ts_right
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, round(value, 6) AS click_value
                FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""

_SQL_ASOF_JOIN_FORWARD = """
SELECT l.user_id, l.ts, l.event_id,
       r.click_value AS click_value, r.ts AS ts_right
FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT user_id, ts, round(value, 6) AS click_value
                FROM events WHERE event_type = 'click') r
  ON l.user_id = r.user_id AND l.ts <= r.ts
"""

# Nearest = compose DuckDB's native backward and forward ASOF joins,
# then apply merge_asof's pick rule (closer side wins; exact tie ->
# backward; a side out of tolerance loses) — the same decision the
# Spark plan makes after its two window carries.
_SQL_ASOF_JOIN_NEAREST = """
WITH l AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, ts, round(value, 6) AS click_value
           FROM events WHERE event_type = 'click'),
     b AS (SELECT l.user_id, l.ts, l.event_id, r.click_value AS bv, r.ts AS bts
           FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
     f AS (SELECT l.event_id, r.click_value AS fv, r.ts AS fts
           FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts),
     j AS (SELECT b.user_id, b.ts, b.event_id, bv, bts, fv, fts,
                  (bts IS NOT NULL AND bts >= b.ts - INTERVAL 2 HOUR) AS ok_b,
                  (fts IS NOT NULL AND fts <= b.ts + INTERVAL 2 HOUR) AS ok_f
           FROM b JOIN f ON b.event_id = f.event_id),
     p AS (SELECT *, (ok_b AND (NOT ok_f OR (ts - bts) <= (fts - ts))) AS use_b
           FROM j)
SELECT user_id, ts, event_id,
       CASE WHEN use_b THEN bv WHEN ok_f THEN fv END AS click_value,
       CASE WHEN use_b THEN bts WHEN ok_f THEN fts END AS ts_right
FROM p
"""

_SQL_ASOF_JOIN_STRICT = """
WITH c AS (SELECT user_id, ts, event_id, round(value, 6) AS v
           FROM events WHERE event_type = 'click')
SELECT l.user_id, l.ts, l.event_id, r.v AS prev_click_value, r.ts AS ts_right
FROM c l ASOF LEFT JOIN c r ON l.user_id = r.user_id AND l.ts > r.ts
"""

_SQL_RESAMPLE_FFILL = """
WITH src AS (
  SELECT event_type, ts, round(value, 6) AS value FROM events WHERE value > 19
), obs AS (
  SELECT event_type,
         make_timestamp(cast(floor(epoch(ts) / 3600) * 3600 AS bigint) * 1000000) AS gts,
         avg(value) AS value
  FROM src GROUP BY 1, 2
), bounds AS (
  SELECT event_type,
         make_timestamp(cast(floor(epoch(min(ts)) / 3600) * 3600 AS bigint) * 1000000) AS lo,
         max(ts) AS hi
  FROM src GROUP BY 1
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 3600 SECONDS)) AS gts
  FROM bounds
)
SELECT g.event_type, g.gts AS ts,
       round(last_value(o.value IGNORE NULLS) OVER (
         PARTITION BY g.event_type ORDER BY g.gts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value
FROM grid g LEFT JOIN obs o ON g.event_type = o.event_type AND g.gts = o.gts
"""

_SQL_AR1_FORECAST = """
WITH RECURSIVE s AS (
  SELECT date_trunc('day', ts) AS ts,
         cast(sum(cast(value AS decimal(28,6))) AS double) AS y,
         cast(count(*) AS double) AS x
  FROM events GROUP BY 1
), l AS (
  SELECT y, x, lag(y) OVER (ORDER BY ts) AS yl FROM s
), m AS (  -- population co-moments over the lag-aligned sample
  SELECT var_pop(yl) AS v1, var_pop(x) AS v2, covar_pop(yl, x) AS c12,
         covar_pop(y, yl) AS cy1, covar_pop(y, x) AS cy2,
         avg(y) AS my, avg(yl) AS m1, avg(x) AS m2
  FROM l WHERE yl IS NOT NULL
), fit AS (  -- 3-parameter OLS via the demeaned 2x2 normal equations
  SELECT (cy1 * v2 - cy2 * c12) / (v1 * v2 - c12 * c12) AS phi,
         (cy2 * v1 - cy1 * c12) / (v1 * v2 - c12 * c12) AS b,
         my - (cy1 * v2 - cy2 * c12) / (v1 * v2 - c12 * c12) * m1
            - (cy2 * v1 - cy1 * c12) / (v1 * v2 - c12 * c12) * m2 AS c
  FROM m
), lastv AS (
  SELECT y AS y0, x AS x0, ts AS ts0 FROM s ORDER BY ts DESC LIMIT 1
), rec(k, yhat) AS (
  SELECT 1, c + phi * y0 + b * x0 FROM fit, lastv
  UNION ALL
  SELECT k + 1, c + phi * yhat + b * x0 FROM rec, fit, lastv WHERE k < 7
)
SELECT ts0 + k * INTERVAL 1 DAY AS ts, round(yhat, 4) AS yhat
FROM rec, lastv ORDER BY ts
"""

# Cramer-rule determinant expansions for the symmetric 4x4 ridge
# system (a11..a44 = XtX + 1e-8 I, b1..b4 = Xty). Machine-generated
# permanent-sign expansion (24 terms each) — symbolic, so the SQL is
# the exact closed form of the same solve numpy performs.
_DET4 = dict(
    d0="a11*a22*a33*a44 - a11*a22*a34*a34 - a11*a23*a23*a44 + a11*a23*a34*a24 + a11*a24*a23*a34 - a11*a24*a33*a24 - a12*a12*a33*a44 + a12*a12*a34*a34 + a12*a23*a13*a44 - a12*a23*a34*a14 - a12*a24*a13*a34 + a12*a24*a33*a14 + a13*a12*a23*a44 - a13*a12*a34*a24 - a13*a22*a13*a44 + a13*a22*a34*a14 + a13*a24*a13*a24 - a13*a24*a23*a14 - a14*a12*a23*a34 + a14*a12*a33*a24 + a14*a22*a13*a34 - a14*a22*a33*a14 - a14*a23*a13*a24 + a14*a23*a23*a14",
    d1="b1*a22*a33*a44 - b1*a22*a34*a34 - b1*a23*a23*a44 + b1*a23*a34*a24 + b1*a24*a23*a34 - b1*a24*a33*a24 - a12*b2*a33*a44 + a12*b2*a34*a34 + a12*a23*b3*a44 - a12*a23*a34*b4 - a12*a24*b3*a34 + a12*a24*a33*b4 + a13*b2*a23*a44 - a13*b2*a34*a24 - a13*a22*b3*a44 + a13*a22*a34*b4 + a13*a24*b3*a24 - a13*a24*a23*b4 - a14*b2*a23*a34 + a14*b2*a33*a24 + a14*a22*b3*a34 - a14*a22*a33*b4 - a14*a23*b3*a24 + a14*a23*a23*b4",
    d2="a11*b2*a33*a44 - a11*b2*a34*a34 - a11*a23*b3*a44 + a11*a23*a34*b4 + a11*a24*b3*a34 - a11*a24*a33*b4 - b1*a12*a33*a44 + b1*a12*a34*a34 + b1*a23*a13*a44 - b1*a23*a34*a14 - b1*a24*a13*a34 + b1*a24*a33*a14 + a13*a12*b3*a44 - a13*a12*a34*b4 - a13*b2*a13*a44 + a13*b2*a34*a14 + a13*a24*a13*b4 - a13*a24*b3*a14 - a14*a12*b3*a34 + a14*a12*a33*b4 + a14*b2*a13*a34 - a14*b2*a33*a14 - a14*a23*a13*b4 + a14*a23*b3*a14",
    d3="a11*a22*b3*a44 - a11*a22*a34*b4 - a11*b2*a23*a44 + a11*b2*a34*a24 + a11*a24*a23*b4 - a11*a24*b3*a24 - a12*a12*b3*a44 + a12*a12*a34*b4 + a12*b2*a13*a44 - a12*b2*a34*a14 - a12*a24*a13*b4 + a12*a24*b3*a14 + b1*a12*a23*a44 - b1*a12*a34*a24 - b1*a22*a13*a44 + b1*a22*a34*a14 + b1*a24*a13*a24 - b1*a24*a23*a14 - a14*a12*a23*b4 + a14*a12*b3*a24 + a14*a22*a13*b4 - a14*a22*b3*a14 - a14*b2*a13*a24 + a14*b2*a23*a14",
    d4="a11*a22*a33*b4 - a11*a22*b3*a34 - a11*a23*a23*b4 + a11*a23*b3*a24 + a11*b2*a23*a34 - a11*b2*a33*a24 - a12*a12*a33*b4 + a12*a12*b3*a34 + a12*a23*a13*b4 - a12*a23*b3*a14 - a12*b2*a13*a34 + a12*b2*a33*a14 + a13*a12*a23*b4 - a13*a12*b3*a24 - a13*a22*a13*b4 + a13*a22*b3*a14 + a13*b2*a13*a24 - a13*b2*a23*a14 - b1*a12*a23*a34 + b1*a12*a33*a24 + b1*a22*a13*a34 - b1*a22*a33*a14 - b1*a23*a13*a24 + b1*a23*a23*a14",
)

_SQL_FOURIER1_FORECAST = """
WITH s AS (
  SELECT date_trunc('day', ts) AS ts,
         cast(sum(cast(value AS decimal(28,6))) AS double) / count(*) AS y
  FROM events GROUP BY 1
), idx AS (
  SELECT y, cast(row_number() OVER (ORDER BY ts) - 1 AS double) AS t FROM s
), feat AS (
  SELECT y, t, sin(2*pi()*t/7) AS s1, cos(2*pi()*t/7) AS c1 FROM idx
), m AS (  -- the 14 moments of the [1, t, sin, cos] design
  SELECT cast(count(*) AS double) AS n_, sum(t) AS st, sum(t*t) AS stt,
         sum(s1) AS ss, sum(c1) AS sc, sum(t*s1) AS sts, sum(t*c1) AS stc,
         sum(s1*c1) AS ssc, sum(s1*s1) AS hs, sum(c1*c1) AS hc,
         sum(y) AS sy, sum(y*t) AS sty, sum(y*s1) AS sys_, sum(y*c1) AS syc
  FROM feat
), a AS (  -- XtX + 1e-8 I (the worker's _fit_beta ridge), Xty
  SELECT n_ + 1e-8 AS a11, st AS a12, ss AS a13, sc AS a14,
         stt + 1e-8 AS a22, sts AS a23, stc AS a24,
         hs + 1e-8 AS a33, ssc AS a34, hc + 1e-8 AS a44,
         sy AS b1, sty AS b2, sys_ AS b3, syc AS b4, n_ FROM m
), beta AS (  -- Cramer's rule on the 4x4 ridge system
  SELECT ({d1}) / ({d0}) AS beta1,
         ({d2}) / ({d0}) AS beta2,
         ({d3}) / ({d0}) AS beta3,
         ({d4}) / ({d0}) AS beta4, n_ FROM a
), lastv AS (
  SELECT ts AS ts0 FROM s ORDER BY ts DESC LIMIT 1
), steps AS (
  SELECT unnest(range(1, 8)) AS k
)
SELECT ts0 + to_days(cast(k AS int)) AS ts,
       round(beta1 + beta2 * (n_ - 1 + k)
             + beta3 * sin(2*pi()*(n_ - 1 + k)/7)
             + beta4 * cos(2*pi()*(n_ - 1 + k)/7), 4) AS yhat
FROM steps, beta, lastv ORDER BY ts
""".format(**_DET4)

_SQL_VAR1_FORECAST = """
WITH RECURSIVE s AS (
  SELECT date_trunc('day', ts) AS ts,
         cast(sum(cast(value AS decimal(28,6))) AS double) / count(*) AS y,
         count(*) / 1000.0 AS x
  FROM events GROUP BY 1
), l AS (
  SELECT y, x,
         lag(y) OVER (ORDER BY ts) AS yl,
         lag(x) OVER (ORDER BY ts) AS xl
  FROM s
), m AS (  -- population co-moments over the lag-aligned sample
  SELECT var_pop(yl) AS v1, var_pop(xl) AS v2, covar_pop(yl, xl) AS c12,
         covar_pop(y, yl) AS cy1, covar_pop(y, xl) AS cy2,
         covar_pop(x, yl) AS cx1, covar_pop(x, xl) AS cx2,
         avg(y) AS my, avg(x) AS mx, avg(yl) AS m1, avg(xl) AS m2
  FROM l WHERE yl IS NOT NULL
), fit AS (  -- per-equation OLS via the demeaned 2x2 normal equations
  SELECT (cy1 * v2 - cy2 * c12) / (v1 * v2 - c12 * c12) AS ayy,
         (cy2 * v1 - cy1 * c12) / (v1 * v2 - c12 * c12) AS ayx,
         (cx1 * v2 - cx2 * c12) / (v1 * v2 - c12 * c12) AS axy,
         (cx2 * v1 - cx1 * c12) / (v1 * v2 - c12 * c12) AS axx,
         my - (cy1 * v2 - cy2 * c12) / (v1 * v2 - c12 * c12) * m1
            - (cy2 * v1 - cy1 * c12) / (v1 * v2 - c12 * c12) * m2 AS cy,
         mx - (cx1 * v2 - cx2 * c12) / (v1 * v2 - c12 * c12) * m1
            - (cx2 * v1 - cx1 * c12) / (v1 * v2 - c12 * c12) * m2 AS cx
  FROM m
), lastv AS (
  SELECT y AS y0, x AS x0, ts AS ts0 FROM s ORDER BY ts DESC LIMIT 1
), rec(k, yy, xx) AS (
  SELECT 1, cy + ayy * y0 + ayx * x0, cx + axy * y0 + axx * x0
  FROM fit, lastv
  UNION ALL
  SELECT k + 1, cy + ayy * yy + ayx * xx, cx + axy * yy + axx * xx
  FROM rec, fit WHERE k < 5
)
SELECT ts0 + k * INTERVAL 1 DAY AS ts, round(yy, 4) AS yhat
FROM rec, lastv ORDER BY ts
"""

_SQL_SET_OPS = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT o_custkey, 'both_years' AS set_op FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
UNION ALL
SELECT o_custkey, 'churned_1996' AS set_op FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
"""

_SQL_DATETIME_PARSE = """
WITH raw AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
              ELSE strftime(o_orderdate, '%Y%m%d') END AS raw_ts
  FROM orders
)
SELECT o_orderkey, raw_ts,
       coalesce(try_strptime(raw_ts, '%Y-%m-%d %H:%M:%S'),
                try_strptime(raw_ts, '%m/%d/%Y'),
                try_strptime(raw_ts, '%Y%m%d')) AS parsed_ts
FROM raw
WHERE o_orderkey <= 2000
"""

_SQL_BUCKETED_JOIN = """
SELECT o_orderpriority,
       cast(sum(cast(l_extendedprice * (1 - l_discount) as decimal(28,6))) * 1000000 as bigint) AS revenue_micros,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""

_SQL_RANGE_JOIN = """
WITH anchors AS (
  SELECT event_id AS anchor_id, ts AS w_start, ts + INTERVAL 10 MINUTE AS w_end
  FROM events WHERE event_id % 97 = 0
)
SELECT anchor_id, count(*) AS n_events,
       round(cast(sum(cast(value as decimal(28,6))) as double), 6) AS sum_value
FROM events e JOIN anchors a ON e.ts >= a.w_start AND e.ts < a.w_end
GROUP BY anchor_id
"""

_SQL_PREDICT_SPLICE = """
WITH series AS (
  """ + _SQL_DAILY_PLAIN + """
), feat AS (
  SELECT ts, y,
         lag(y, 1) OVER w AS y_lag_1,
         lag(y, 2) OVER w AS y_lag_2,
         lag(y, 3) OVER w AS y_lag_3,
         row_number() OVER (ORDER BY ts DESC) AS rd
  FROM series
  WINDOW w AS (ORDER BY ts)
)
SELECT '0' AS series_id, ts,
       round(y, 6) AS y,
       round(y_lag_1, 6) AS y_lag_1,
       round(y_lag_2, 6) AS y_lag_2,
       round(y_lag_3, 6) AS y_lag_3,
       cast(month(ts) AS int) AS ts_month,
       cast(quarter(ts) AS int) AS ts_quarter,
       cast(isodow(ts) - 1 AS int) AS ts_dayofweek,
       cast(CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS int) AS ts_weekend,
       cast(day(ts) AS int) AS ts_dayofmonth
FROM feat WHERE rd <= 8
"""

_SQL_DF_TEST = """
WITH series AS (
  """ + _SQL_DAILY_PLAIN + """
), base AS (
  SELECT y, lag(y) OVER (ORDER BY ts) AS x FROM series
), d AS (
  SELECT x, y - x AS dy FROM base WHERE x IS NOT NULL
), m AS (
  SELECT cast(count(*) AS BIGINT) AS n,
         var_pop(x) AS vx, var_pop(dy) AS vd, covar_pop(x, dy) AS cxd
  FROM d
)
SELECT '0' AS series_id, n,
       round(cxd / vx, 6) AS beta,
       round((cxd / vx) / sqrt((n * (vd - cxd * cxd / vx) / (n - 2)) / (n * vx)), 6)
         AS df_tstat,
       (cxd / vx) / sqrt((n * (vd - cxd * cxd / vx) / (n - 2)) / (n * vx)) < -2.86
         AS stationary
FROM m
"""

_SQL_SNAIVE_INTERVALS = """
WITH series AS (
  """ + _SQL_DAILY_PLAIN + """
), ranked AS (
  SELECT ts, y, row_number() OVER (ORDER BY ts DESC) AS rd FROM series
), last AS (SELECT max(ts) AS last_ts FROM series),
resid AS (
  SELECT y - lag(y, 7) OVER (ORDER BY ts) AS r FROM series
), q AS (
  SELECT quantile_cont(r, 0.025) AS qlo, quantile_cont(r, 0.975) AS qhi
  FROM resid WHERE r IS NOT NULL
), steps AS (SELECT cast(unnest(range(1, 8)) AS int) AS step)
SELECT '0' AS series_id,
       last_ts + step * INTERVAL 1 DAY AS ts,
       step,
       round(y, 6) AS yhat,
       round(y + qlo, 6) AS yhat_lower,
       round(y + qhi, 6) AS yhat_upper
FROM ranked, last, q, steps
WHERE rd = 8 - step
"""

_SQL_LSH_RECALL = """
SELECT cast(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
       cast(3 AS int) AS k,
       true AS recall_ok
FROM embeddings WHERE vec_id < 20
"""

_SQL_IVF_RECALL = """
SELECT cast(count(DISTINCT vec_id) AS BIGINT) AS n_queries,
       cast(3 AS int) AS k,
       cast(1.0 AS double) AS recall
FROM embeddings WHERE vec_id < 5
"""

_SQL_SEASONAL_PERIOD_MAP = """
SELECT freq, cast(m AS int) AS m, freq = 'days' AS inferred
FROM (VALUES
  ('days', 30), ('hours', 24), ('minutes', 60), ('months', 12),
  ('quarters', 4), ('seconds', 60), ('semi', 2), ('weeks', 52), ('years', 1)
) AS t(freq, m)
"""

_SQL_AUTOML_LEADERBOARD_CONTRACT = """
SELECT cast(3 AS BIGINT) AS n_models,
       cast(6 AS BIGINT) AS n_folds_total,
       true AS ranks_ok,
       true AS scores_positive,
       true AS rmse_monotone
"""

_SQL_FEATURE_IMPORTANCE_CONTRACT = """
SELECT cast(8 AS BIGINT) AS n_features,
       true AS nonneg,
       true AS sums_to_one,
       true AS ranks_ok
"""

# The multimodal query decodes REAL payloads on a deterministic
# container schedule (multimodal._image_payload): BMP, PNG, baseline
# JPEG 4:2:0 (operators/jpeg.py: pure numpy Huffman+IDCT; lossy but
# bit-deterministic), PROGRESSIVE JPEG (r11 — i%6==1 rows; spectral
# selection + successive approximation decode to pixels bit-identical
# to the baseline encode of the same coefficients, so these constants
# did not change when the schedule switched those rows to SOF2) and
# GIF (operators/gif.py: pure-python LZW, palette-limited fixtures),
# TIFF (PackBits/LZW/JPEG-in-TIFF), WebP lossless (r13), LOSSLESS
# JPEG (r13 — SOF3 rows 14/38, bit-exact so the PNG-row constants
# they replaced are unchanged) and 12-BIT JPEG (r13 — SOF1 row 22,
# decode-identical to the 8-bit row it replaced because the ×16
# table scaling cancels).
# The features are exact platform-stable constants, so the full path
# (eight real container decodes, mapInPandas batching, row routing)
# gets a value-checked oracle. Regenerate with the snippet in
# tests/test_multimodal_oracle.py if the image generator, schedule, or
# any codec changes.
_SQL_MULTIMODAL = """
SELECT cast(media_id AS BIGINT) AS media_id,
       cast(mean_r AS double) AS mean_r,
       cast(mean_g AS double) AS mean_g,
       cast(mean_b AS double) AS mean_b,
       cast(std_gray AS double) AS std_gray
FROM (VALUES
  (0, 127.332357, 127.109375, 126.404622, 41.960298),
  (1, 127.90832, 125.719623, 125.629827, 42.741463),
  (2, 127.934545, 127.343636, 127.726061, 43.169497),
  (3, 121.694469, 138.644718, 141.35616, 39.992685),
  (4, 127.946267, 129.474265, 128.815045, 47.325157),
  (5, 126.805305, 128.365327, 127.173913, 42.88683),
  (6, 129.420833, 126.116071, 125.247619, 42.829136),
  (7, 128.112389, 127.855993, 127.775798, 43.335282),
  (8, 128.577813, 124.475938, 128.701563, 42.643517),
  (9, 134.251584, 125.507994, 126.034992, 42.229472),
  (10, 128.906177, 127.345571, 128.22669, 47.655593),
  (11, 127.623486, 127.813292, 127.80766, 42.048969),
  (12, 126.782782, 126.381434, 127.95527, 42.544935),
  (13, 129.055013, 127.908015, 129.179828, 43.350962),
  (14, 128.150857, 128.617714, 127.672, 43.403336),
  (15, 119.062414, 138.325877, 134.752831, 46.224178),
  (16, 126.484976, 126.333534, 129.599159, 47.903579),
  (17, 126.68447, 127.592163, 128.737591, 42.409637),
  (18, 127.540088, 125.056503, 127.416982, 42.601911),
  (19, 127.723119, 128.129759, 127.745355, 42.957933),
  (20, 127.666471, 127.845, 125.829706, 42.293903),
  (21, 141.02927, 131.127593, 136.082978, 47.562587),
  (22, 129.153571, 126.584615, 126.692857, 47.676334),
  (23, 125.897422, 129.192134, 129.103641, 42.863509),
  (24, 128.545898, 129.206055, 127.60026, 42.482748),
  (25, 128.237991, 128.88854, 127.146311, 42.976906),
  (26, 128.074545, 129.202727, 126.341515, 42.51095),
  (27, 147.964296, 140.039801, 122.209541, 44.570622),
  (28, 128.968891, 127.212387, 127.087952, 48.101824),
  (29, 127.480722, 125.891715, 127.2863, 43.859163),
  (30, 124.941964, 126.238095, 127.433036, 42.106271),
  (31, 127.237425, 129.257545, 126.023283, 43.092903),
  (32, 127.66625, 126.4525, 125.534375, 43.019135),
  (33, 133.776471, 125.161086, 123.220211, 35.248949),
  (34, 128.948135, 127.937646, 130.018357, 47.519426),
  (35, 127.492256, 125.889327, 126.802309, 42.31115),
  (36, 127.088848, 124.066176, 128.560355, 42.481665),
  (37, 127.687962, 127.382135, 127.361727, 42.748866),
  (38, 127.306857, 126.199714, 127.766571, 41.911827),
  (39, 134.213477, 144.920464, 119.396852, 41.167234),
  (40, 128.478065, 127.888522, 127.258413, 47.088943),
  (41, 125.739332, 128.437446, 127.78897, 43.397894),
  (42, 128.950758, 127.370896, 127.221275, 42.808158),
  (43, 126.27414, 126.44837, 128.628389, 42.999669),
  (44, 128.165, 127.707353, 127.343235, 42.771513),
  (45, 110.031543, 115.622052, 123.385621, 39.330794),
  (46, 126.668132, 126.583242, 128.462912, 47.783627),
  (47, 128.296838, 127.954823, 129.259899, 42.644288)
) AS t(media_id, mean_r, mean_g, mean_b, std_gray)
"""

_SQL_C4_LINE_CLEAN = r"""
WITH lined AS (
  SELECT doc_id, replace(text, ' table ', '.' || chr(10)) AS text FROM documents
), s AS (
  SELECT doc_id, text, string_split(text, chr(10)) AS lines FROM lined
), k AS (
  SELECT doc_id, text, lines,
         list_filter(lines, l ->
             len(regexp_split_to_array(trim(l), '\s+')) >= 3
             AND regexp_matches(trim(l), '[.!?"”]$')
             AND NOT contains(lower(l), 'javascript')) AS keptl
  FROM s
)
SELECT doc_id,
       len(lines) AS n_lines_total,
       len(keptl) AS n_lines_kept,
       (NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{')
        AND len(keptl) >= 2) AS keep,
       md5(coalesce(array_to_string(keptl, chr(10)), '')) AS clean_md5
FROM k
"""

_SQL_BOILERPLATE_LINES = r"""
WITH lined AS (
  SELECT doc_id, replace(text, ' table ', '.' || chr(10)) AS text FROM documents
), s AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines FROM lined
), ex AS (
  SELECT doc_id, unnest(lines) AS line FROM s
), norm AS (  -- the operator fingerprints NORMALIZED line text
  SELECT doc_id,
         trim(regexp_replace(lower(trim(line)), '[^a-z0-9]+', ' ', 'g')) AS nline
  FROM ex WHERE length(trim(line)) >= 10
), boiler AS (
  SELECT nline FROM norm
  GROUP BY nline HAVING count(DISTINCT doc_id) > 2
), b AS (
  SELECT coalesce(list(nline), []) AS bl FROM boiler
), f AS (
  SELECT s.doc_id, s.lines,
         list_filter(s.lines, l -> NOT (length(trim(l)) >= 10
             AND list_contains(b.bl,
                 trim(regexp_replace(lower(trim(l)), '[^a-z0-9]+', ' ', 'g'))))
         ) AS keptl
  FROM s, b
)
SELECT doc_id,
       cast(len(keptl) AS BIGINT) AS n_lines_kept,
       cast(len(lines) - len(keptl) AS BIGINT) AS n_boilerplate_dropped,
       md5(coalesce(array_to_string(keptl, chr(10)), '')) AS clean_md5
FROM f
"""

_SQL_PACK_MANIFEST = f"""
WITH t AS (
  SELECT doc_id, coalesce(len({_SQL_TOKS}), 0) AS n_toks FROM documents
), c AS (
  SELECT doc_id, n_toks,
         sum(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
), spans AS (
  SELECT doc_id,
         cast(cum - n_toks AS BIGINT) AS s,
         cast(cum AS BIGINT) AS e
  FROM c WHERE n_toks > 0
), ex AS (
  SELECT doc_id, s, e,
         unnest(generate_series(s // 64, (e - 1) // 64)) AS seq_id
  FROM spans
)
SELECT cast(seq_id AS BIGINT) AS seq_id,
       doc_id,
       cast(greatest(s, seq_id * 64) - s AS BIGINT) AS doc_tok_start,
       cast(least(e, (seq_id + 1) * 64) - s AS BIGINT) AS doc_tok_end,
       cast(greatest(s, seq_id * 64) - seq_id * 64 AS BIGINT) AS seq_tok_start,
       cast(least(e, (seq_id + 1) * 64) - greatest(s, seq_id * 64) AS BIGINT)
         AS n_toks
FROM ex ORDER BY seq_id, doc_id
"""

_SQL_DRIFT_PROFILE = """
WITH src AS (
  SELECT 'value' AS col, cast(value AS double) AS v, event_id % 2 = 0 AS is_old
  FROM events WHERE value IS NOT NULL
  UNION ALL
  SELECT 'user_id', cast(user_id AS double), event_id % 2 = 0
  FROM events WHERE user_id IS NOT NULL
), b AS (
  SELECT col, min(v) AS mn, max(v) AS mx FROM src WHERE is_old GROUP BY col
), cuts AS (  -- same association as the operator: mn + i * ((mx-mn)/20)
  SELECT b.col, b.mn + i * ((b.mx - b.mn) / 20.0) AS cut
  FROM b, generate_series(1, 19) t(i)
), bucketed AS (
  SELECT s.col,
         (SELECT count(*) FROM cuts c WHERE c.col = s.col AND s.v > c.cut)
           AS bucket,
         s.is_old
  FROM src s
), counts AS (
  SELECT col, bucket,
         sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
         sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS c_new
  FROM bucketed GROUP BY col, bucket
), e AS (
  SELECT col, bucket, c_old, c_new,
         sum(c_old) OVER (PARTITION BY col) AS n_old,
         sum(c_new) OVER (PARTITION BY col) AS n_new,
         sum(c_old) OVER (PARTITION BY col ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum_old,
         sum(c_new) OVER (PARTITION BY col ORDER BY bucket
                          ROWS UNBOUNDED PRECEDING) AS cum_new
  FROM counts
)
SELECT col AS "column",
       cast(max(n_old) AS BIGINT) AS n_old,
       cast(max(n_new) AS BIGINT) AS n_new,
       round(max(abs(cum_old / cast(n_old AS double)
                     - cum_new / cast(n_new AS double))), 6) AS ks,
       round(sum((c_new / cast(n_new AS double) + 1e-6
                  - (c_old / cast(n_old AS double) + 1e-6))
                 * ln((c_new / cast(n_new AS double) + 1e-6)
                      / (c_old / cast(n_old AS double) + 1e-6))), 6) AS psi
FROM e GROUP BY col ORDER BY col
"""

_SQL_CATEGORICAL_DRIFT = """
WITH src AS (
  SELECT 'event_type' AS col,
         coalesce(cast(event_type AS varchar), '__null__') AS v,
         event_id % 2 = 0 AS is_old
  FROM events
  UNION ALL
  SELECT 'props', coalesce(cast(props AS varchar), '__null__'),
         event_id % 2 = 0
  FROM events
), counts AS (
  SELECT col, v,
         sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS c_old,
         sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS c_new
  FROM src GROUP BY col, v
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY col
                               ORDER BY c_old + c_new DESC, v ASC) AS rk
  FROM counts
), bucketed AS (
  SELECT col, CASE WHEN rk <= 10 THEN v ELSE '__other__' END AS cat,
         sum(c_old) AS c_old, sum(c_new) AS c_new
  FROM ranked GROUP BY 1, 2
), e AS (
  SELECT col, cat, c_old, c_new,
         sum(c_old) OVER (PARTITION BY col) AS n_old,
         sum(c_new) OVER (PARTITION BY col) AS n_new
  FROM bucketed
)
SELECT col AS "column",
       cast(max(n_old) AS BIGINT) AS n_old,
       cast(max(n_new) AS BIGINT) AS n_new,
       -- exact-integer numerator (matches the operator): immune to
       -- float-summation order across engines
       round(cast(sum(abs(c_old * n_new - c_new * n_old)) AS double)
             / (2.0 * max(n_old) * max(n_new)), 6) AS tv,
       round(sum((c_new / cast(n_new AS double) + 1e-6
                  - (c_old / cast(n_old AS double) + 1e-6))
                 * ln((c_new / cast(n_new AS double) + 1e-6)
                      / (c_old / cast(n_old AS double) + 1e-6))), 6) AS psi
FROM e GROUP BY col ORDER BY col
"""

# The video query decodes REAL video payloads (operators/
# multimodal.py): raw-DIB AVI rows byte-exact, and the i%4==1 rows
# Motion-JPEG ('MJPG' AVI chunks — r11; MP4 sample-table walk, row 5,
# and Matroska EBML walk, row 13 — r13; all three containers wrap the
# same quality-92 JPEG payloads, so the MJPEG constants are
# container-invariant; lossy but bit-deterministic, generated from
# the actual decode) over the deterministic _video_frames clips.
# Regenerate by collecting q_video_frame_features if the clip
# generator, schedule, or any codec changes.
_SQL_VIDEO_FRAME_FEATURES = """
SELECT cast(media_id AS BIGINT) AS media_id,
       cast(frame_idx AS int) AS frame_idx,
       cast(mean_gray AS double) AS mean_gray,
       cast(std_gray AS double) AS std_gray
FROM (VALUES
  (0, 0, 127.071181, 43.519314),
  (0, 2, 125.892795, 42.9839),
  (1, 0, 128.953939, 42.15785),
  (1, 2, 127.421414, 42.30028),
  (2, 0, 128.273756, 42.927406),
  (2, 2, 129.766591, 44.236296),
  (2, 4, 126.684389, 40.723464),
  (3, 0, 128.032099, 42.388559),
  (3, 2, 128.418695, 44.187671),
  (4, 0, 129.530382, 43.228957),
  (4, 2, 123.597222, 43.354313),
  (5, 0, 128.914343, 43.521756),
  (5, 2, 129.933737, 42.896065),
  (5, 4, 126.564848, 42.791291),
  (6, 0, 128.835219, 41.740901),
  (6, 2, 126.007541, 42.969372),
  (7, 0, 128.426102, 43.449379),
  (7, 2, 128.232099, 42.159014),
  (8, 0, 128.22309, 43.219174),
  (8, 2, 127.653212, 42.884012),
  (8, 4, 125.309462, 42.136179),
  (9, 0, 127.441212, 41.870476),
  (9, 2, 127.244848, 44.52028),
  (10, 0, 128.550528, 40.542864),
  (10, 2, 125.409502, 42.933812),
  (11, 0, 127.412698, 43.974231),
  (11, 2, 127.176014, 42.246278),
  (11, 4, 129.145679, 43.823716),
  (12, 0, 129.581597, 42.510783),
  (12, 2, 128.570313, 42.078895),
  (13, 0, 128.288889, 40.808053),
  (13, 2, 128.086061, 42.313214),
  (14, 0, 130.010935, 41.747891),
  (14, 2, 126.760935, 43.415488),
  (14, 4, 128.191176, 42.823774),
  (15, 0, 126.724515, 43.283707),
  (15, 2, 127.148854, 42.830941)
) AS t(media_id, frame_idx, mean_gray, std_gray)
"""

# The audio query decodes REAL RIFF/WAV payloads (PCM16 sines at
# 220+10i Hz from multimodal._audio_wave) and computes Hann-windowed
# power-spectral features — the centroid of a pure tone IS its
# frequency, so these constants are self-evidently correct (each
# centroid lands within 3e-6 Hz of the generator's 220+10i), not just
# platform-stable. Regenerate with the snippet in
# tests/test_multimodal_oracle.py if the wave generator or the
# spectral math changes.
_SQL_AUDIO_SPECTRAL = """
SELECT cast(media_id AS BIGINT) AS media_id,
       cast(spectral_centroid_hz AS double) AS spectral_centroid_hz,
       cast(rolloff85_hz AS double) AS rolloff85_hz,
       cast(flatness AS double) AS flatness
FROM (VALUES
  (0, 220.000002, 221.0, 0.0),
  (1, 230.000002, 230.769231, 0.0),
  (2, 240.000002, 240.518962, 0.0),
  (3, 250.000002, 250.249252, 0.0),
  (4, 260.000002, 260.956175, 0.0),
  (5, 270.000002, 270.646766, 0.0),
  (6, 280.000002, 280.318091, 0.0),
  (7, 290.000002, 290.963257, 0.0),
  (8, 300.000002, 300.595238, 0.0),
  (9, 310.000002, 310.208127, 0.0),
  (10, 320.000002, 320.792079, 0.0),
  (11, 330.000002, 330.365974, 0.0),
  (12, 340.000002, 340.909091, 0.0),
  (13, 350.000002, 350.444225, 0.0),
  (14, 360.000003, 360.946746, 0.0),
  (15, 370.000002, 370.44335, 0.0)
) AS t(media_id, spectral_centroid_hz, rolloff85_hz, flatness)
"""

# G.711 twin of the audio oracle (r11): the same tone family through
# the mu-law/A-law expansion tables. Constants generated from the
# actual decode and SELF-EVIDENTLY PLAUSIBLE: 8-bit companding noise
# is broadband ~38 dB under a half-scale tone, so every centroid must
# sit within ~1 Hz of its generator frequency (it does: max offset
# 0.88 Hz) and flatness must stay ~0 — a broken expansion table
# cannot produce these numbers. Regenerate by collecting
# q_audio_g711_features if the tables or the spectral math change.
_SQL_AUDIO_G711 = """
SELECT cast(media_id AS BIGINT) AS media_id,
       cast(spectral_centroid_hz AS double) AS spectral_centroid_hz,
       cast(rolloff85_hz AS double) AS rolloff85_hz,
       cast(flatness AS double) AS flatness
FROM (VALUES
  (0, 220.580438, 221.0, 0.0),
  (1, 230.416349, 231.0, 0.0),
  (2, 240.604956, 241.0, 0.0),
  (3, 250.270772, 251.0, 0.0),
  (4, 260.594682, 261.0, 0.0),
  (5, 270.39998, 271.0, 0.0),
  (6, 280.651457, 281.0, 0.0),
  (7, 290.420463, 291.0, 0.0),
  (8, 300.877529, 301.0, 0.0),
  (9, 310.422277, 311.0, 0.0),
  (10, 320.500073, 321.0, 0.0),
  (11, 330.399038, 331.0, 0.0),
  (12, 340.592183, 341.0, 0.0),
  (13, 350.444728, 351.0, 0.0),
  (14, 360.537411, 361.0, 0.0),
  (15, 370.434986, 371.0, 0.0)
) AS t(media_id, spectral_centroid_hz, rolloff85_hz, flatness)
"""

# IMA/DVI4 ADPCM twin of the audio oracle (r12): the same tone family
# through the 4-bit IMA quantizer (format 17, 89-step table,
# independent 256-byte blocks). Constants generated from the actual
# decode and SELF-EVIDENTLY PLAUSIBLE: ADPCM keeps a half-scale tone
# above ~40 dB SNR, so every centroid sits within ~1 Hz of its
# 220+10i Hz generator frequency (max offset 0.55 Hz) and flatness
# stays ~0 (quantization noise is broadband) — a broken step/index
# table cannot produce these numbers. Regenerate by collecting
# q_audio_ima_adpcm_features if the tables or the spectral math
# change.
_SQL_AUDIO_IMA_ADPCM = """
SELECT cast(media_id AS BIGINT) AS media_id,
       cast(spectral_centroid_hz AS double) AS spectral_centroid_hz,
       cast(rolloff85_hz AS double) AS rolloff85_hz,
       cast(flatness AS double) AS flatness
FROM (VALUES
  (0, 220.183197, 221.0, 1.8e-05),
  (1, 230.235412, 231.0, 2.6e-05),
  (2, 240.247268, 241.0, 1e-05),
  (3, 250.230977, 251.0, 1.1e-05),
  (4, 260.31625, 261.0, 2.4e-05),
  (5, 270.290885, 271.0, 3.5e-05),
  (6, 280.269669, 281.0, 2.2e-05),
  (7, 290.32963, 291.0, 3.8e-05),
  (8, 300.35137, 301.0, 2.4e-05),
  (9, 310.392356, 311.0, 4e-05),
  (10, 320.547179, 321.0, 1e-06),
  (11, 330.396872, 331.0, 6.1e-05),
  (12, 340.458069, 341.0, 5.7e-05),
  (13, 350.48238, 351.0, 2.8e-05),
  (14, 360.498213, 361.0, 3.9e-05),
  (15, 370.551673, 371.0, 6.9e-05)
) AS t(media_id, spectral_centroid_hz, rolloff85_hz, flatness)
"""

# Misra-Gries heavy hitters (operators/sketches.py, r10): UNIGRAMS —
# the fixture vocabulary grows with sf and the bigram universe with
# its square (84k distinct at sf1; an sf1 parity run caught a bigram
# form deflating), so only the unigram universe keeps "no partition
# ever exceeds capacity" true at every sweep scale. The summary then
# provably never deflates and the result is EXACT — the oracle is the
# plain exact top-k with the error certificate pinned to (0, true).
# Bigram + deflation regimes are pytest-checked adversarially
# (tests/test_sketches.py).
_SQL_HEAVY_HITTERS = """
WITH c AS (
  SELECT t.term, cast(count(*) AS BIGINT) AS est_count FROM (
    SELECT unnest(string_split_regex(trim(regexp_replace(lower(text),
           '[^a-z0-9]+', ' ', 'g')), ' ')) AS term FROM documents
  ) t WHERE t.term <> '' GROUP BY t.term
)
SELECT term, est_count, cast(0 AS BIGINT) AS max_undercount, true AS exact
FROM c ORDER BY est_count DESC, term LIMIT 20
"""

# streaming twin: same exact-regime (unigram) argument as
# _SQL_HEAVY_HITTERS — per-shard capacity is never exceeded at any
# sweep scale, so the streaming Misra-Gries state equals exact counts
# and defl==0 on every shard
_SQL_STREAMING_HEAVY_HITTERS = """
WITH c AS (
  SELECT t.term, cast(count(*) AS BIGINT) AS est_count FROM (
    SELECT unnest(string_split_regex(trim(regexp_replace(lower(text),
           '[^a-z0-9]+', ' ', 'g')), ' ')) AS term FROM documents
  ) t WHERE t.term <> '' GROUP BY t.term
)
SELECT term, est_count, true AS exact
FROM c ORDER BY est_count DESC, term LIMIT 20
"""

# Cluster-balanced sampling (operators/sampling.py, r13): the oracle
# replays the ENTIRE pipeline — exact-dyadic demo centroids (identical
# binary doubles in both engines), per-vector squared-L2 argmin with
# the same sequential fold and (distance, cluster) tie-break the Spark
# HOF computes, then the md5-rank per-cluster quota cut — so cluster
# assignment AND selection are value-checked end to end.
def _sql_cluster_balanced(per_cluster: int = 30) -> str:
    from auto_ts_spark.operators.sampling import demo_centroids

    cents = demo_centroids(4, 64)
    values = ",\n  ".join(
        "(%d, [%s]::DOUBLE[])" % (j, ", ".join(repr(x) for x in c))
        for j, c in enumerate(cents)
    )
    return f"""
WITH cents(j, cv) AS (VALUES
  {values}
),
v AS (SELECT vec_id, label, cast(embedding AS double[]) AS ve FROM embeddings),
d AS (
  SELECT vec_id, label, j,
         list_sum(list_transform(list_zip(ve, cv),
                                 x -> (x[1] - x[2]) * (x[1] - x[2]))) AS d2
  FROM v, cents
),
a AS (
  SELECT vec_id, label, j AS cluster,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, j ASC) AS pick
  FROM d
),
r AS (
  SELECT vec_id, label, cluster,
         row_number() OVER (
           PARTITION BY cluster
           ORDER BY {_sql_hash60("concat(cast(vec_id AS varchar), ':42')")} ASC,
                    vec_id ASC
         ) AS rk
  FROM a WHERE pick = 1
)
SELECT vec_id, label, cast(cluster AS int) AS cluster
FROM r WHERE rk <= {per_cluster}
"""


_SQL_CLUSTER_BALANCED_SAMPLE = _sql_cluster_balanced()

_SQL_STRATIFIED_SAMPLE = f"""
WITH r AS (
  SELECT doc_id, source, lang,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_sql_hash60("concat(cast(doc_id AS varchar), ':42')")} ASC,
                    doc_id ASC
         ) AS rk
  FROM documents
)
SELECT doc_id, source, lang FROM r WHERE rk <= 25
"""

# BPE (operators/bpe.py, r10): the oracle replays the first training
# iteration's statistic exactly — word histogram → char+'</w>' symbol
# lists → adjacent-pair counts weighted by word frequency — in pure
# DuckDB list/HOF SQL. The contract twin re-derives the first MERGE
# (the argmax of this statistic with the deterministic count-desc,
# pair-asc tie-break) so the training loop's entry point is
# value-checked against an independent engine.
_SQL_BPE_PAIRS_BODY = f"""
WITH w AS (
  SELECT unnest({_SQL_TOKS}) AS word FROM documents
), h AS (
  SELECT word, count(*) AS cnt FROM w WHERE word <> '' GROUP BY word
), s AS (
  SELECT cnt,
         list_append(list_transform(range(1, length(word) + 1),
                                    i -> word[i]), '</w>') AS syms
  FROM h
), p AS (
  SELECT cnt,
         unnest(list_transform(range(1, len(syms)),
                               i -> {{'l': syms[i], 'r': syms[i + 1]}})) AS pr
  FROM s
)
SELECT pr.l AS "left", pr.r AS "right",
       cast(sum(cnt) AS BIGINT) AS pair_count
FROM p GROUP BY 1, 2
"""

_SQL_BPE_PAIR_COUNTS = (
    _SQL_BPE_PAIRS_BODY + 'ORDER BY pair_count DESC, "left", "right" LIMIT 40'
)

_SQL_BPE_TOKENIZE_CONTRACT = f"""
WITH pairs AS ({_SQL_BPE_PAIRS_BODY}),
first_merge AS (
  SELECT "left", "right" FROM pairs
  ORDER BY pair_count DESC, "left", "right" LIMIT 1
)
SELECT cast(50 AS int) AS n_merges,
       true AS coverage_full,
       true AS detok_lossless,
       true AS compressed,
       "left" AS first_left,
       "right" AS first_right
FROM first_merge
"""

ORACLES: dict[str, str] = {
    "bpe_pair_counts": _SQL_BPE_PAIR_COUNTS,
    "bpe_tokenize_contract": _SQL_BPE_TOKENIZE_CONTRACT,
    "heavy_hitters": _SQL_HEAVY_HITTERS,
    "streaming_heavy_hitters": _SQL_STREAMING_HEAVY_HITTERS,
    "stratified_sample": _SQL_STRATIFIED_SAMPLE,
    "cluster_balanced_sample": _SQL_CLUSTER_BALANCED_SAMPLE,
    "video_frame_features": _SQL_VIDEO_FRAME_FEATURES,
    "audio_spectral_features": _SQL_AUDIO_SPECTRAL,
    "audio_g711_features": _SQL_AUDIO_G711,
    "audio_ima_adpcm_features": _SQL_AUDIO_IMA_ADPCM,
    "resample_ffill": _SQL_RESAMPLE_FFILL,
    "asof_join": _SQL_ASOF_JOIN,
    "asof_join_forward": _SQL_ASOF_JOIN_FORWARD,
    "asof_join_nearest": _SQL_ASOF_JOIN_NEAREST,
    "asof_join_strict": _SQL_ASOF_JOIN_STRICT,
    "seasonal_decompose": _SQL_SEASONAL_DECOMPOSE,
    "quantile_profile": _SQL_QUANTILE_PROFILE,
    "residual_diagnostics": _SQL_RESIDUAL_DIAG,
    "revenue_rollup": _SQL_REVENUE_ROLLUP,
    "forecast_viz_join": _SQL_FORECAST_VIZ_JOIN,
    "label_encode": _SQL_LABEL_ENCODE,
    "acf": _SQL_ACF,
    "zero_variance": _SQL_ZERO_VARIANCE,
    "problem_type": _SQL_PROBLEM_TYPE,
    "tpch_pricing_summary": _SQL_TPCH_Q1,
    "shipping_priority": _SQL_SHIPPING_PRIORITY,
    "lag_matrix": _SQL_LAG_MATRIX,
    "difference": _SQL_DIFFERENCE,
    "cumsum": _SQL_CUMSUM,
    "rolling_stats": _SQL_ROLLING,
    "calendar_features": _SQL_CALENDAR,
    "frequency_inference": _SQL_FREQ,
    "future_index": _SQL_FUTURE_INDEX,
    "expanding_folds": _SQL_EXPANDING_FOLDS,
    "sliding_folds": _SQL_SLIDING_FOLDS,
    "naive_forecast_metrics": _SQL_NAIVE_METRICS,
    "weighted_cv_rmse": _SQL_WEIGHTED_CV,
    "column_profile": _SQL_COLUMN_PROFILE,
    "frequency_table": _SQL_FREQ_TABLE,
    "class_weights": _SQL_CLASS_WEIGHTS,
    "token_explode": _SQL_TOKEN_EXPLODE,
    "doc_chunks": _SQL_DOC_CHUNKS,
    "actual_vs_predicted_join": _SQL_ACTUAL_PRED_JOIN,
    "train_tail_splice": _SQL_TRAIN_TAIL_SPLICE,
    "leaderboard": _SQL_LEADERBOARD,
    "topk_suppliers": _SQL_TOPK_SUPPLIERS,
    "top_correlations": _SQL_TOP_CORR,
    "minmax_profile": _SQL_MINMAX,
    "text_profile": _SQL_TEXT_PROFILE,
    "repetition_profile": _SQL_REPETITION_PROFILE,
    "corpus_vocabulary": _SQL_CORPUS_VOCAB,
    "dataset_split": _SQL_DATASET_SPLIT,
    "language_id": _SQL_LANGUAGE_ID,
    "exact_dedup_stats": _SQL_EXACT_DEDUP,
    "ngram_jaccard_pairs": _SQL_NGRAM_JACCARD,
    "minhash_lsh_pairs": _SQL_MINHASH_LSH,
    "dedup_clusters": _SQL_DEDUP_CLUSTERS,
    "simhash_fingerprints": _SQL_SIMHASH,
    "winnow_overlap_pairs": _SQL_WINNOW_OVERLAP,
    "pii_redaction": _SQL_PII_REDACTION,
    "html_extract": _SQL_HTML_EXTRACT,
    "decontaminate": _SQL_DECONTAMINATE,
    "domain_doc_counts": _SQL_DOMAIN_DOC_COUNTS,
    "mixture_sample": _SQL_MIXTURE_SAMPLE,
    "budget_select": _SQL_BUDGET_SELECT,
    "quality_filter": _SQL_QUALITY_FILTER,
    "embedding_topk": _SQL_EMBEDDING_TOPK,
    "embedding_near_dup": _SQL_EMBEDDING_NEAR_DUP,
    "semantic_dedup": _SQL_SEMANTIC_DEDUP,
    "semantic_dedup_ivf": _SQL_SEMANTIC_DEDUP_IVF,
    "minhash_lsh_slice": _SQL_MINHASH_LSH_SLICE,
    "dedup_clusters_slice": _SQL_DEDUP_CLUSTERS_SLICE,
    "embedding_near_dup_slice": _SQL_EMBEDDING_NEAR_DUP_SLICE,
    "dsir_weights": _SQL_DSIR_WEIGHTS,
    "repeated_span_scrub": _SQL_REPEATED_SPAN_SCRUB,
    "lm_perplexity": _SQL_LM_SCORED,
    "perplexity_buckets": _SQL_PERPLEXITY_BUCKETS,
    "quality_classifier": _SQL_QUALITY_CLASSIFIER,
    "hourly_rollup": _SQL_HOURLY_ROLLUP,
    "streaming_hourly_rollup": _SQL_STREAMING_HOURLY_ROLLUP,
    "sessionize": _SQL_SESSIONIZE,
    "fillna_ffill": _SQL_FILLNA_FFILL,
    "json_props_extract": _SQL_JSON_PROPS,
    "customer_set_ops": _SQL_SET_OPS,
    "datetime_parse": _SQL_DATETIME_PARSE,
    "bucketed_join_revenue": _SQL_BUCKETED_JOIN,
    "range_join_window": _SQL_RANGE_JOIN,
    "pacf": _SQL_PACF,
    "predict_feature_splice": _SQL_PREDICT_SPLICE,
    "df_test_stationarity": _SQL_DF_TEST,
    "snaive_forecast_intervals": _SQL_SNAIVE_INTERVALS,
    "lsh_ann_recall": _SQL_LSH_RECALL,
    "ivf_ann_recall": _SQL_IVF_RECALL,
    "multimodal_features": _SQL_MULTIMODAL,
    "automl_leaderboard_contract": _SQL_AUTOML_LEADERBOARD_CONTRACT,
    "feature_importance_contract": _SQL_FEATURE_IMPORTANCE_CONTRACT,
    "seasonal_period_map": _SQL_SEASONAL_PERIOD_MAP,
    "ar1_forecast": _SQL_AR1_FORECAST,
    "var1_forecast": _SQL_VAR1_FORECAST,
    "fourier1_forecast": _SQL_FOURIER1_FORECAST,
    "streaming_sessionize": _SQL_STREAMING_SESSIONIZE,
    "dedup_columns": _SQL_DEDUP_COLUMNS,
    "streaming_sliding_rollup": _SQL_STREAMING_SLIDING_ROLLUP,
    "streaming_dedup": _SQL_STREAMING_DEDUP,
    "streaming_forecast_state": _SQL_STREAMING_FORECAST_STATE,
    "c4_line_clean": _SQL_C4_LINE_CLEAN,
    "boilerplate_lines": _SQL_BOILERPLATE_LINES,
    "pack_manifest": _SQL_PACK_MANIFEST,
    "drift_profile": _SQL_DRIFT_PROFILE,
    "categorical_drift": _SQL_CATEGORICAL_DRIFT,
}
