package graft

/** DuckDB oracle SQL — one entry per SQL-expressible query in
  * [[SparkEntry.queries]], with column names/aliases matching the Spark
  * output exactly (the driver sorts columns by name before hashing).
  *
  * Determinism rules mirrored from SparkEntry:
  *  - `events.ts` is nanosecond-precision in parquet; every use goes
  *    through `CAST(ts AS TIMESTAMP)` (µs truncation = Spark's reader).
  *  - double aggregates rounded identically; similarity math uses the
  *    same fixed-point (·10⁶ floor) quantization as the Spark side, so
  *    sums are exact integers and order-independent.
  *  - DuckDB `regexp_replace` needs the 'g' flag to match Spark's
  *    replace-all semantics.
  *
  * Sketch queries (q22 MinHash, q23 SimHash, q36 IVF, q37 corpus
  * annotate) are exactly reproducible here because their hashing is the
  * md5-derived [[graft.functions.AuditableHash]] family — `h60(s)` =
  * first 15 hex chars of md5 as a BIGINT, with MinHash permutation
  * constants regenerated in SQL from `md5('minhash:a:i')`. MinHash
  * `est_jaccard` values are dyadic rationals (k/64), so the doubles
  * compare exactly unrounded.
  *
  * q27's hyperplane buckets are exact integer facts (fixed-point
  * LshBuckets), so its oracle embeds the quantized plane matrix as
  * literals and recomputes the buckets in SQL.
  *
  * Only q34 (HLL sketch internals are engine-specific by nature) is
  * omitted → driver records the weaker rows-only check; its accuracy
  * is asserted against the exact count in ScalaTest instead.
  */
object OracleSql {

  private val q01 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_base_price,
           round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                          * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) / 10000.0, 4) AS sum_disc_price,
           round(sum(l_quantity) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  private val q02 = """
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity >= 30
    ORDER BY l_orderkey, l_linenumber"""

  private val q03 = """
    SELECT r_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    ORDER BY r_name"""

  private val q04 = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    ORDER BY o_orderkey"""

  private val q05 = """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    ORDER BY c_custkey"""

  private val q06 = """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           round(sum(value), 2) AS sum_value,
           max(event_id) AS max_event_id
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""

  private val q07 = """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  private val q08 = """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
    WHERE rn = 1
    ORDER BY o_custkey"""

  private val q09 = """
    SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spend,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY total_spend DESC, o_custkey
    LIMIT 5"""

  private val q10 = """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM (SELECT DISTINCT o_orderkey, o_orderstatus, o_totalprice
          FROM (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
                UNION ALL
                SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
                WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'))
    ORDER BY o_orderkey"""

  private val q11 = """
    WITH cur AS (
      SELECT c_custkey, c_mktsegment, c_acctbal, DATE '9999-12-31' AS expired
      FROM customer),
    inc AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment || '_X'
                  ELSE c_mktsegment END AS c_mktsegment,
             CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 100.0, 2)
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey,
             'NEWSEG' AS c_mktsegment, 0.0 AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0),
    changed AS (
      SELECT cur.c_custkey FROM cur JOIN inc ON cur.c_custkey = inc.c_custkey
      WHERE cur.c_mktsegment IS DISTINCT FROM inc.c_mktsegment
         OR cur.c_acctbal IS DISTINCT FROM inc.c_acctbal),
    expired AS (
      SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, DATE '2026-01-01' AS expired
      FROM cur c WHERE c.c_custkey IN (SELECT c_custkey FROM changed)),
    surviving AS (
      SELECT * FROM cur
      WHERE c_custkey NOT IN (SELECT c_custkey FROM changed)),
    ins AS (
      SELECT i.c_custkey, i.c_mktsegment, i.c_acctbal, DATE '9999-12-31' AS expired
      FROM inc i
      WHERE i.c_custkey NOT IN (SELECT c_custkey FROM surviving))
    SELECT * FROM surviving
    UNION ALL SELECT * FROM expired
    UNION ALL SELECT * FROM ins
    ORDER BY c_custkey, expired"""

  private val q12 = """
    WITH e AS (
      SELECT event_id, event_type, user_id, value FROM events WHERE event_id % 2 = 0),
    i AS (
      SELECT event_id, 'upd_' || event_type AS event_type, user_id,
             round(value + 1000, 2) AS value
      FROM events WHERE event_id % 3 = 0)
    SELECT coalesce(e.event_id, i.event_id) AS event_id,
           CASE WHEN e.event_id IS NULL THEN i.event_type ELSE e.event_type END AS event_type,
           CASE WHEN e.event_id IS NULL THEN i.user_id ELSE e.user_id END AS user_id,
           CASE WHEN i.event_id IS NOT NULL THEN i.value ELSE e.value END AS value
    FROM e FULL OUTER JOIN i ON e.event_id = i.event_id
    ORDER BY event_id"""

  private val q13 = """
    SELECT n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS cust_cnt,
           (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS supp_cnt
    FROM nation
    ORDER BY n_name"""

  private val q14 = """
    SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY day"""

  private val q15 = """
    WITH src AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 6 = 0 THEN 'Thỏa thuận'
                  WHEN p_partkey % 6 = 1 THEN 'Tới ' || CAST(p_size AS VARCHAR) || ' triệu'
                  WHEN p_partkey % 6 = 2 THEN 'Trên ' || CAST(p_size AS VARCHAR) || ' triệu'
                  WHEN p_partkey % 6 = 3 THEN CAST(p_size AS VARCHAR) || ' - ' || CAST(p_size + 5 AS VARCHAR) || ' triệu'
                  WHEN p_partkey % 6 = 4 THEN '1,200 - 1,800 USD'
                  ELSE 'lương hấp dẫn' END AS salary_raw
      FROM part),
    t AS (
      SELECT p_partkey, salary_raw,
             lower(regexp_replace(salary_raw, '[,.]', '', 'g')) AS tl
      FROM src),
    n AS (
      SELECT p_partkey, salary_raw, tl,
             regexp_extract(tl, '(\d+)', 1) AS n1,
             regexp_extract(tl, '\d+\D+?(\d+)', 1) AS n2
      FROM t)
    SELECT p_partkey, salary_raw,
           CASE WHEN contains(tl, 'thỏa thuận') THEN 0
                WHEN contains(tl, 'tới') AND n1 <> '' THEN 0
                WHEN contains(tl, 'trên') AND n1 <> '' THEN TRY_CAST(n1 AS BIGINT) * 1000000
                WHEN n2 <> '' THEN TRY_CAST(n1 AS BIGINT) * 1000000
                ELSE 0 END AS min_salary_vnd,
           CASE WHEN contains(tl, 'thỏa thuận') THEN 0
                WHEN contains(tl, 'tới') AND n1 <> '' THEN TRY_CAST(n1 AS BIGINT) * 1000000
                WHEN contains(tl, 'trên') AND n1 <> '' THEN 0
                WHEN n2 <> '' THEN TRY_CAST(n2 AS BIGINT) * 1000000
                ELSE 0 END AS max_salary_vnd
    FROM n
    ORDER BY p_partkey"""

  private val q16 = """
    WITH src AS (
      SELECT o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 4 = 0 THEN 'hôm qua'
                  WHEN o_orderkey % 4 = 1 THEN CAST(o_orderkey % 7 AS VARCHAR) || ' ngày trước'
                  WHEN o_orderkey % 4 = 2 THEN '2 tuần trước'
                  ELSE 'vừa xong' END AS posted_raw
      FROM orders),
    p AS (
      SELECT o_orderkey, posted_raw, lower(posted_raw) AS sl,
             TRY_CAST(regexp_extract(lower(posted_raw), '(\d+)', 1) AS INTEGER) AS n,
             CAST(o_orderdate AS DATE) AS base
      FROM src)
    SELECT o_orderkey, posted_raw,
           CASE WHEN contains(sl, 'hôm qua') THEN base - 1
                WHEN contains(sl, 'ngày trước') THEN base - n
                WHEN contains(sl, 'tuần trước') THEN base - (n * 7)
                ELSE base END AS posted_date
    FROM p
    ORDER BY o_orderkey"""

  private val normFp =
    "md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')))"

  private val q17 = s"""
    SELECT doc_id, md5(text) AS content_md5, $normFp AS content_fp
    FROM documents
    ORDER BY doc_id"""

  private val q18 = """
    SELECT event_id, CAST(ts AS DATE) AS day,
           strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_str,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS epoch_s,
           make_timestamp((1700000000 + event_id) * 1000000) AS synth_ts,
           round(value / 1000, 6) AS value_k
    FROM events
    ORDER BY event_id"""

  private val q19 = """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY date_trunc('hour', CAST(ts AS TIMESTAMP))
    ORDER BY hour_start"""

  private val q20 = """
    SELECT doc_id, md5(text) AS content_md5,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
    FROM documents
    ORDER BY doc_id"""

  private val q21 = s"""
    SELECT doc_id, $normFp AS content_fp,
           min(doc_id) OVER (PARTITION BY $normFp) AS canonical_id,
           doc_id <> min(doc_id) OVER (PARTITION BY $normFp) AS is_duplicate
    FROM documents
    ORDER BY doc_id"""

  private val q24 = """
    WITH toks AS (
      SELECT doc_id, source,
             CASE WHEN text IS NULL OR trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk
      FROM documents),
    sh AS (
      SELECT doc_id, source,
             list_distinct(
               CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                    ELSE list_transform(range(1, len(tk) - 1),
                                        i -> array_to_string(tk[i:i+2], ' ')) END) AS shingles
      FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                 (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))),
                 6) AS jaccard
    FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.shingles, b.shingles)) > 0
    ORDER BY id_a, id_b"""

  /** h60 — must stay in lock-step with AuditableHash.duckH60. */
  private def h60(expr: String) =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Tokens CTE body (lowercased) — the SQL mirror of TextFunctions.tokens. */
  private def lowerToksFrom(table: String) = s"""
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tk
      FROM $table"""
  private val lowerToks = lowerToksFrom("documents")

  /** Distinct 3-shingle rows per doc (short docs collapse to whole text;
    * empty docs keep one '' shingle) — mirror of Dedup.shingleRows.
    */
  private def shingleRowsFrom(table: String) = s"""
    toks AS (${lowerToksFrom(table)}),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                    ELSE list_transform(range(1, len(tk) - 1),
                                        i -> array_to_string(tk[i:i+2], ' ')) END)) AS shingle
      FROM toks)"""
  private val shingleRows = shingleRowsFrom("documents")

  /** MinHash signature CTEs (64 permutations of the auditable universal
    * family) — produces `sig(doc_id, i, m)` and `sigfull(doc_id, sig)`.
    */
  private val minhashSig = s"""
    hx AS (
      SELECT doc_id, ${h60("shingle")} % 1073741824 AS h FROM sh),
    perm AS (
      SELECT i,
             ${h60("'minhash:a:' || CAST(i AS VARCHAR)")} % 1073741823 + 1 AS a,
             ${h60("'minhash:b:' || CAST(i AS VARCHAR)")} % 2147483647 AS b
      FROM range(64) t(i)),
    sig AS (
      SELECT doc_id, i, min((a * h + b) % 2147483647) AS m
      FROM hx CROSS JOIN perm
      GROUP BY doc_id, i),
    sigfull AS (
      SELECT doc_id, list(m ORDER BY i) AS sig FROM sig GROUP BY doc_id),
    banded AS (
      SELECT doc_id, i // 4 AS band, list(m ORDER BY i) AS band_key
      FROM sig GROUP BY doc_id, i // 4),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
    est AS (
      SELECT id_a, id_b,
             CAST(len(list_filter(range(1, 65), i -> siga[i] = sigb[i])) AS DOUBLE) / 64 AS est_jaccard
      FROM (SELECT c.id_a, c.id_b, sa.sig AS siga, sb.sig AS sigb
            FROM cand c
            JOIN sigfull sa ON sa.doc_id = c.id_a
            JOIN sigfull sb ON sb.doc_id = c.id_b))"""

  private val q22 = s"""
    WITH $shingleRows, $minhashSig,
    pairs AS (SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= 0.2),
    perdoc AS (
      SELECT doc_id, count(*) AS n_candidates, max(est_jaccard) AS max_est_jaccard
      FROM (SELECT id_a AS doc_id, est_jaccard FROM pairs
            UNION ALL SELECT id_b AS doc_id, est_jaccard FROM pairs)
      GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(p.n_candidates, 0) AS n_candidates,
           coalesce(p.max_est_jaccard, 0.0) AS max_est_jaccard
    FROM documents d LEFT JOIN perdoc p ON d.doc_id = p.doc_id
    ORDER BY d.doc_id"""

  private val q23 = s"""
    WITH toks AS ($lowerToks),
    tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
    th AS (SELECT doc_id, ${h60("'simhash:' || t")} AS h FROM tok),
    bits AS (
      SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM th CROSS JOIN (SELECT CAST(x AS INTEGER) AS b FROM range(60) t(x))
      GROUP BY doc_id, b),
    sig0 AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id),
    sigs AS (
      SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
      FROM documents d LEFT JOIN sig0 s ON d.doc_id = s.doc_id),
    chunks AS (
      SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS cv
      FROM sigs CROSS JOIN (SELECT CAST(x AS INTEGER) AS c FROM range(4) t(x))),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM chunks a JOIN chunks b
        ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id),
    pairs AS (SELECT id_a, id_b FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 3),
    perdoc AS (
      SELECT doc_id, count(*) AS n_near
      FROM (SELECT id_a AS doc_id FROM pairs UNION ALL SELECT id_b AS doc_id FROM pairs)
      GROUP BY doc_id)
    SELECT s.doc_id, s.simhash, coalesce(p.n_near, 0) AS n_near
    FROM sigs s LEFT JOIN perdoc p ON s.doc_id = p.doc_id
    ORDER BY s.doc_id"""

  private val quantize =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  private val q25 = s"""
    WITH base AS (
      SELECT vec_id, label, $quantize AS qe FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.qe AS qa, b.qe AS qb
      FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id),
    sc AS (
      SELECT id_a, id_b,
             CAST(list_sum(list_transform(range(1, 65), i -> qa[i] * qb[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i -> qa[i] * qa[i])) AS BIGINT) AS n2a,
             CAST(list_sum(list_transform(range(1, 65), i -> qb[i] * qb[i])) AS BIGINT) AS n2b
      FROM pairs)
    SELECT id_a, id_b,
           round(CASE WHEN n2a = 0 OR n2b = 0 THEN 0.0
                      ELSE CAST(dot AS DOUBLE) /
                           (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE))) END, 6) AS cosine
    FROM sc
    WHERE round(CASE WHEN n2a = 0 OR n2b = 0 THEN 0.0
                     ELSE CAST(dot AS DOUBLE) /
                          (sqrt(CAST(n2a AS DOUBLE)) * sqrt(CAST(n2b AS DOUBLE))) END, 6) >= 0.2
    ORDER BY id_a, id_b"""

  private val q26 = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    q AS (SELECT vec_id AS query_id, qe AS qq FROM base WHERE vec_id < 10),
    c AS (SELECT vec_id AS id, qe AS qc FROM base),
    sc AS (
      SELECT q.query_id, c.id,
             CAST(list_sum(list_transform(range(1, 65), i -> qc[i] * qq[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i -> qc[i] * qc[i])) AS BIGINT) AS n2c,
             CAST(list_sum(list_transform(range(1, 65), i -> qq[i] * qq[i])) AS BIGINT) AS n2q
      FROM c JOIN q ON c.id <> q.query_id),
    scored AS (
      SELECT query_id, id,
             round(CASE WHEN n2c = 0 OR n2q = 0 THEN 0.0
                        ELSE CAST(dot AS DOUBLE) /
                             (sqrt(CAST(n2c AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE))) END, 6) AS cosine
      FROM sc),
    ranked AS (
      SELECT query_id, id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, id, cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** Quantized-cosine SQL over pre-aliased list columns `xq`,`yq` with
    * norms `xn`,`yn` — mirror of VectorFunctions.cosineFromQuantized.
    */
  private def qcos(xq: String, yq: String, xn: String, yn: String) = s"""
    CASE WHEN $xn = 0 OR $yn = 0 THEN 0.0
         ELSE CAST(CAST(list_sum(list_transform(range(1, 65), i -> $xq[i] * $yq[i])) AS BIGINT) AS DOUBLE)
              / (sqrt(CAST($xn AS DOUBLE)) * sqrt(CAST($yn AS DOUBLE))) END"""

  private val q36 = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    qcell AS (
      SELECT vec_id AS query_id, qe AS qq, n2v AS qn2, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM (SELECT vec_id, qe, n2v FROM n2 WHERE vec_id < 10) q CROSS JOIN cents),
    probes AS (SELECT query_id, qq, qn2, centroid_id FROM qcell WHERE rn <= 4),
    cand AS (
      SELECT query_id, id,
             round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
      WHERE a.id <> p.query_id),
    ranked AS (
      SELECT query_id, id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
      FROM cand)
    SELECT query_id, id, cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** Shared body of q37/q50 (annotate pipeline), without ORDER BY. */
  private val q37Body = s"""
    WITH $shingleRows, $minhashSig,
    neardup AS (
      SELECT DISTINCT id_b AS doc_id FROM est WHERE est_jaccard >= 0.8),
    fp AS (
      SELECT doc_id,
             doc_id <> min(doc_id) OVER (PARTITION BY $normFp) AS is_duplicate
      FROM documents),
    rawtoks AS (
      SELECT doc_id, text,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk,
             CASE WHEN text IS NULL OR trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\\s+') END AS tl
      FROM documents),
    feats AS (
      SELECT doc_id, tl,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             CASE WHEN len(tl) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(tl, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                       / CAST(len(tl) AS DOUBLE) END AS sw_ratio,
             CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) END AS p_ratio
      FROM rawtoks),
    qual AS (
      SELECT doc_id, n_tokens,
             round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                   + least(sw_ratio * 4.0, 1.0) * 0.3
                   + (1.0 - least(p_ratio * 10.0, 1.0)) * 0.3, 6) AS quality,
             len(list_filter(tl, x -> x IN ('the','a','of','and','is'))) AS c_en,
             len(list_filter(tl, x -> x IN ('der','die','das','und','ist'))) AS c_de,
             len(list_filter(tl, x -> x IN ('le','la','les','et','est'))) AS c_fr,
             len(list_filter(tl, x -> x IN ('el','los','las','y','es'))) AS c_es,
             len(list_filter(tl, x -> x IN ('của','và','là','không','người'))) AS c_vi
      FROM feats)
    SELECT q.doc_id,
           f.is_duplicate,
           n.doc_id IS NOT NULL AS is_near_duplicate,
           q.n_tokens,
           q.quality,
           CASE WHEN greatest(c_en, c_de, c_fr, c_es, c_vi) <= 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'en'
                WHEN c_de = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'de'
                WHEN c_fr = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'fr'
                WHEN c_es = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'es'
                WHEN c_vi = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'vi'
                ELSE 'und' END AS lang_pred
    FROM qual q
    JOIN fp f ON f.doc_id = q.doc_id
    LEFT JOIN neardup n ON n.doc_id = q.doc_id"""

  private val q37 = s"$q37Body ORDER BY q.doc_id"

  private val q50 = s"""
    SELECT doc_id, n_tokens, quality, lang_pred
    FROM ($q37Body)
    WHERE NOT is_duplicate AND NOT is_near_duplicate
      AND quality >= 0.3 AND n_tokens >= 5
    ORDER BY doc_id"""

  private val q28 = """
    SELECT o_orderpriority, count(*) AS total_jobs,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  private val q29 = """
    WITH toks AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\s+') END AS tk
      FROM documents),
    cnt AS (
      SELECT doc_id,
             len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS c_en,
             len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))) AS c_de,
             len(list_filter(tk, x -> x IN ('le','la','les','et','est'))) AS c_fr,
             len(list_filter(tk, x -> x IN ('el','los','las','y','es'))) AS c_es,
             len(list_filter(tk, x -> x IN ('của','và','là','không','người'))) AS c_vi
      FROM toks)
    SELECT doc_id,
           CASE WHEN greatest(c_en, c_de, c_fr, c_es, c_vi) <= 0 THEN 'und'
                WHEN c_en = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'en'
                WHEN c_de = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'de'
                WHEN c_fr = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'fr'
                WHEN c_es = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'es'
                WHEN c_vi = greatest(c_en, c_de, c_fr, c_es, c_vi) THEN 'vi'
                ELSE 'und' END AS lang_pred
    FROM cnt
    ORDER BY doc_id"""

  private val q30 = """
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\s+') END AS tk,
             CASE WHEN text IS NULL OR trim(lower(text)) = '' THEN []
                  ELSE string_split_regex(trim(lower(text)), '\s+') END AS tl
      FROM documents),
    f AS (
      SELECT doc_id, text, tk, tl,
             CAST(len(tk) AS BIGINT) AS n_tokens,
             CAST(coalesce(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')), 0) AS BIGINT) AS n_subwords,
             CASE WHEN len(tl) = 0 THEN 0.0
                  ELSE CAST(len(list_filter(tl, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
                       / CAST(len(tl) AS DOUBLE) END AS sw_ratio,
             CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0
                  ELSE CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / CAST(length(text) AS DOUBLE) END AS p_ratio,
             CASE WHEN len(tk) = 0 THEN 0.0
                  ELSE CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
                       / CAST(len(tk) AS DOUBLE) END AS m_len
      FROM t)
    SELECT doc_id, n_tokens, n_subwords,
           round(sw_ratio, 6) AS stopword_ratio,
           round(p_ratio, 6) AS punct_ratio,
           round(m_len, 6) AS mean_token_len,
           round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                 + least(sw_ratio * 4.0, 1.0) * 0.3
                 + (1.0 - least(p_ratio * 10.0, 1.0)) * 0.3, 6) AS quality
    FROM f
    ORDER BY doc_id"""

  private val q31 = """
    WITH t AS (
      SELECT lang, n_chars,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\s+') END) AS BIGINT) AS tc
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(tc) AS BIGINT) AS total_tokens,
           round(CAST(sum(tc) AS DOUBLE) / count(*), 4) AS avg_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM t
    GROUP BY lang
    ORDER BY lang"""

  private val q32 = """
    SELECT event_id, user_id, substr(props, 1, 80) AS msg, value
    FROM events
    WHERE event_type = 'error'
    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
    LIMIT 5"""

  private val q33 = """
    SELECT n_name,
           (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS cust_cnt,
           (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS supp_cnt
    FROM nation
    ORDER BY n_name"""

  private val q35 = """
    SELECT p_partkey,
           p_type LIKE 'S%' AS is_s_type,
           lower(p_name) AS name_lower,
           trim(regexp_replace(p_name, '\s+', ' ', 'g')) AS name_clean,
           p_brand || '|' || p_type AS brand_type
    FROM part
    ORDER BY p_partkey"""

  private val q38 = """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  private val q39 = """
    WITH e AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
    m AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR date_diff('millisecond', lag(ts) OVER w, ts) > 1800000
                  THEN 1 ELSE 0 END AS new_session
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM m)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM numbered
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start"""

  /** The q27 hyperplanes, quantized exactly as the LshBuckets
    * expression quantizes them (floor(coef·2^20)) and embedded as
    * literals — one definition of bucket identity shared with the
    * engine (Similarity.planeMatrix is the single source of the
    * Gaussian draws).
    */
  private val q27Planes: String = {
    val planes = graft.operators.Similarity.planeMatrix(
      dim = 64, bits = 8, tables = 8, seed = 42L)
    (for { t <- planes.indices; b <- planes(t).indices } yield {
      val qcs = planes(t)(b).map(graft.plans.LshBuckets.quant)
        .mkString("[", ",", "]")
      s"($t, $b, $qcs)"
    }).mkString(", ")
  }

  private val q27 = s"""
    WITH planes(t, b, qc) AS (VALUES $q27Planes),
    emb AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS lx,
             $quantize AS qe
      FROM embeddings),
    n2 AS (
      SELECT vec_id, lx, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM emb),
    buckets AS (
      SELECT vec_id, t,
             CAST(sum(CASE WHEN CAST(list_sum(list_transform(range(1, 65), i -> lx[i] * qc[i])) AS BIGINT) >= 0
                      THEN (1 << b) ELSE 0 END) AS INTEGER) AS bucket
      FROM n2 CROSS JOIN planes
      GROUP BY vec_id, t),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS id
      FROM buckets c JOIN buckets q ON c.t = q.t AND c.bucket = q.bucket
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
    paired AS (
      SELECT cand.query_id, cand.id,
             cv.qe AS aq, cv.n2v AS an2, qv.qe AS qq, qv.n2v AS qn2
      FROM cand
      JOIN n2 cv ON cv.vec_id = cand.id
      JOIN n2 qv ON qv.vec_id = cand.query_id),
    sc AS (
      SELECT query_id, id, round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM paired),
    ranked AS (
      SELECT query_id, id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
      FROM sc)
    SELECT query_id, id, cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  private val q40 = s"""
    WITH sampled AS (
      SELECT doc_id, lang, source FROM documents
      WHERE ${h60("'stratified:' || CAST(doc_id AS VARCHAR)")}
            < CASE WHEN lang = 'en' THEN 576460752303423488
                   WHEN lang = 'de' THEN 288230376151711744
                   ELSE 1152921504606846976 END),
    drawn AS (
      SELECT doc_id, lang, source,
             CAST(${h60("'split:' || source")} AS DOUBLE) / 1152921504606846976.0 AS u
      FROM sampled)
    SELECT doc_id, lang, source,
           CASE WHEN u < 0.1 THEN 'test'
                WHEN u < 0.2 THEN 'val'
                ELSE 'train' END AS split
    FROM drawn
    ORDER BY doc_id"""

  private val q41 = """
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
      FROM documents),
    fp AS (
      SELECT doc_id, unnest(list_distinct(list_transform(range(1, length(t) - 6), i ->
        (CAST(ascii(substr(t, CAST(i AS INTEGER), 1)) AS BIGINT) * 27512614111
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 1, 1)) AS BIGINT) * 887503681
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 2, 1)) AS BIGINT) * 28629151
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 3, 1)) AS BIGINT) * 923521
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 4, 1)) AS BIGINT) * 29791
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 5, 1)) AS BIGINT) * 961
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 6, 1)) AS BIGINT) * 31
         + CAST(ascii(substr(t, CAST(i AS INTEGER) + 7, 1)) AS BIGINT)) % 1073741824))) AS rh
      FROM canon),
    agg AS (
      SELECT doc_id, count(*) AS n_fp, min(rh) AS min_rh, max(rh) AS max_rh
      FROM fp GROUP BY doc_id)
    SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp, a.min_rh, a.max_rh
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id"""

  private val q42 = """
    SELECT l_returnflag,
           percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25_qty,
           percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50_qty,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75_qty,
           percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  private val q43 = """
    SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""

  private val q44 = """
    WITH clicks AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      FROM events WHERE event_type = 'click'),
    views AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS view_ts, round(max(value), 2) AS view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, CAST(ts AS TIMESTAMP))
    SELECT c.event_id, c.user_id, v.view_value
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts >= v.view_ts
    ORDER BY c.event_id"""

  private val q45 = """
    SELECT event_type,
           count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type"""

  private val q46 = """
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           lag(o_totalprice, 1) OVER w AS prev_price
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey"""

  private val q47 = """
    WITH p AS (
      SELECT p_partkey, p_brand, p_name, substr(p_name, 1, 8) AS blk FROM part)
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
    FROM p a JOIN p b
      ON a.p_brand = b.p_brand AND a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 10
    ORDER BY key_a, key_b"""

  private val q48 = """
    WITH canon AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS t
      FROM documents),
    chars AS (
      SELECT doc_id, t, CAST(unnest(range(1, length(t) + 1)) AS INTEGER) AS p
      FROM canon),
    marked AS (
      SELECT doc_id, p, substr(t, p, 1) AS ch,
             CASE WHEN p <= length(t) - 7 AND
               ((CAST(ascii(substr(t, p, 1)) AS BIGINT) * 27512614111
                 + CAST(ascii(substr(t, p + 1, 1)) AS BIGINT) * 887503681
                 + CAST(ascii(substr(t, p + 2, 1)) AS BIGINT) * 28629151
                 + CAST(ascii(substr(t, p + 3, 1)) AS BIGINT) * 923521
                 + CAST(ascii(substr(t, p + 4, 1)) AS BIGINT) * 29791
                 + CAST(ascii(substr(t, p + 5, 1)) AS BIGINT) * 961
                 + CAST(ascii(substr(t, p + 6, 1)) AS BIGINT) * 31
                 + CAST(ascii(substr(t, p + 7, 1)) AS BIGINT)) % 1073741824) % 64 = 63
             THEN 1 ELSE 0 END AS m
      FROM chars),
    numbered AS (
      SELECT doc_id, p, ch,
             CAST(coalesce(sum(m) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 8 PRECEDING), 0) AS BIGINT) AS chunk_no
      FROM marked),
    chunks AS (
      SELECT doc_id, chunk_no,
             md5(string_agg(ch, '' ORDER BY p)) AS chunk_md5,
             count(*) AS chunk_len
      FROM numbered
      GROUP BY doc_id, chunk_no)
    SELECT doc_id, chunk_no, chunk_md5, chunk_len,
           count(*) OVER (PARTITION BY chunk_md5) > 1 AS is_shared
    FROM chunks
    ORDER BY doc_id, chunk_no"""

  private val q49 = """
    WITH h AS (
      SELECT doc_id, text, substr(hex(encode(text)), 1, 16) AS hp FROM documents)
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                WHEN starts_with(hp, '89504E47') THEN 'png'
                WHEN starts_with(hp, 'FFD8FF') THEN 'jpeg'
                WHEN starts_with(hp, '47494638') THEN 'gif'
                WHEN starts_with(hp, '52494646') THEN 'riff'
                WHEN starts_with(hp, '494433') THEN 'mp3'
                WHEN substr(hp, 9, 8) = '66747970' THEN 'mp4'
                ELSE 'unknown' END AS format,
           CASE WHEN text IS NULL THEN 0
                ELSE octet_length(encode(text)) END AS n_bytes,
           (text IS NULL OR octet_length(encode(text)) < 8) AS is_corrupt
    FROM h
    ORDER BY doc_id"""

  private val q51 = """
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\s+') END) AS BIGINT) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST((cum_tokens - n_tokens) // 2000 AS BIGINT) AS bin
    FROM c
    ORDER BY doc_id"""

  /** q48's chunk CTEs re-usable tail (everything up to `chunks`). */
  private val q48Chunks = q48.substring(0, q48.lastIndexOf("SELECT doc_id, chunk_no"))

  private val q52 = s"""
    $q48Chunks
    , cset AS (
      SELECT DISTINCT doc_id, chunk_md5 FROM chunks),
    sized AS (
      SELECT doc_id, chunk_md5,
             count(*) OVER (PARTITION BY doc_id) AS n_chunks
      FROM cset)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared,
           round(CAST(count(*) AS DOUBLE) / least(min(a.n_chunks), min(b.n_chunks)), 6) AS containment
    FROM sized a JOIN sized b
      ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 1
    ORDER BY id_a, id_b"""

  private val q53 = s"""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE CAST(${h60("'weighted:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE) / 1152921504606846976.0
          < least(CAST(n_chars AS DOUBLE) / 3000.0, 1.0)
    ORDER BY doc_id"""

  private val q54 = {
    val bands = graft.SparkEntry.RangeBands
      .map { case (id, lo, hi) => s"($id, $lo, $hi)" }.mkString(", ")
    s"""
    WITH bands(band_id, lo, hi) AS (VALUES $bands)
    SELECT event_id, band_id, value
    FROM events JOIN bands ON lo <= value AND value < hi
    ORDER BY event_id"""
  }

  /** q55: connected components by recursive min-label walk — the walk
    * CTE holds (node, reachable-node) pairs, so min per node is the
    * component minimum exactly (edges are symmetric). Edge set = q52's
    * chunk-overlap pairs at containment >= 0.5 (identical rounding on
    * both sides, so the graphs agree bit-for-bit).
    */
  private val q55 = s"""
    ${q48Chunks.replaceFirst("WITH canon", "WITH RECURSIVE canon")}
    , cset AS (
      SELECT DISTINCT doc_id, chunk_md5 FROM chunks),
    sized AS (
      SELECT doc_id, chunk_md5,
             count(*) OVER (PARTITION BY doc_id) AS n_chunks
      FROM cset),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sized a JOIN sized b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING round(CAST(count(*) AS DOUBLE) / least(min(a.n_chunks), min(b.n_chunks)), 6) >= 0.5),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id),
    cc AS (
      SELECT id, CAST(min(comp) AS BIGINT) AS comp FROM walk GROUP BY id),
    lab AS (
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id, d.n_chars
      FROM documents d LEFT JOIN cc c ON d.doc_id = c.id)
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY n_chars DESC, doc_id ASC) = 1 AS is_canonical
    FROM lab
    ORDER BY doc_id"""

  private val q56 = """
    WITH s1 AS (
      SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS t_view
      FROM events WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > s1.t_view
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > s2.t_click
      GROUP BY e.user_id)
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           CAST(1 + CASE WHEN s2.t_click IS NULL THEN 0 ELSE 1 END
                  + CASE WHEN s3.t_purchase IS NULL THEN 0 ELSE 1 END AS INTEGER) AS depth
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s1.user_id = s3.user_id
    ORDER BY s1.user_id"""

  private val q57 = """
    WITH f AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    a AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    ORDER BY cohort_day, day_offset"""

  private val q58 = """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(coalesce(text, '')), '\s+')) AS term
      FROM documents),
    t AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    d AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM t GROUP BY term),
    r AS (
      SELECT t.doc_id, t.term, t.tf, d.df_docs,
             CAST(row_number() OVER (PARTITION BY t.doc_id
               ORDER BY t.tf DESC, d.df_docs ASC, t.term ASC) AS INTEGER) AS rnk
      FROM t JOIN d ON t.term = d.term)
    SELECT doc_id, term, tf, df_docs, rnk
    FROM r WHERE rnk <= 3
    ORDER BY doc_id, rnk"""

  private val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiIp    = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PiiPhone = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  private val q59 = s"""
    WITH c AS (
      SELECT c_custkey,
             'reach ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR) ||
             '@example.com or 555-' ||
             lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-' ||
             lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
             ' host 10.' || CAST(c_custkey % 256 AS VARCHAR) || '.0.1' AS contact
      FROM customer)
    SELECT c_custkey,
           CAST(len(regexp_extract_all(contact, '$PiiEmail')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(contact, '$PiiPhone')) AS INTEGER) AS n_phone,
           CAST(len(regexp_extract_all(contact, '$PiiIp')) AS INTEGER) AS n_ip,
           regexp_replace(regexp_replace(regexp_replace(contact,
             '$PiiEmail', '<EMAIL>', 'g'),
             '$PiiIp', '<IP>', 'g'),
             '$PiiPhone', '<PHONE>', 'g') AS redacted
    FROM c
    ORDER BY c_custkey"""

  /** q60's oracle is the PLAIN join: the bloom prefilter must be
    * invisible in the result (false positives die in the join).
    */
  private val q60 = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  private val q61 = """
    WITH c AS (
      SELECT event_id AS click_id, user_id, CAST(ts AS TIMESTAMP) AS click_ts
      FROM events WHERE event_type = 'click'),
    v AS (
      SELECT event_id AS view_id, user_id, CAST(ts AS TIMESTAMP) AS view_ts
      FROM events WHERE event_type = 'view')
    SELECT c.click_id, v.view_id, c.user_id,
           epoch_us(c.click_ts) - epoch_us(v.view_ts) AS micros_between
    FROM c JOIN v ON c.user_id = v.user_id
      AND v.view_ts <= c.click_ts
      AND c.click_ts < v.view_ts + INTERVAL 10 MINUTE
    ORDER BY click_id, view_id"""

  /** q62: the full portable-HLL estimator recomputed in SQL — register
    * index / rank are exact integer facts of the auditable hash (bit
    * length via `bin`, no float log2), the harmonic sum is fixed-point
    * BIGINT (order-free), and the single double constant is embedded
    * from the same driver-side value the Spark plan uses
    * ([[graft.operators.HllSketch.rawNumerator]] — `Double.toString`
    * round-trips through DuckDB's correctly-rounded parse).
    */
  private val q62 = {
    val n = graft.operators.HllSketch.rawNumerator(256)
    val h60 = "CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""
    WITH h AS (
      SELECT l_returnflag, $h60 AS h60
      FROM lineitem WHERE l_partkey IS NOT NULL),
    r AS (
      SELECT l_returnflag, CAST(h60 % 256 AS INTEGER) AS register,
             CAST(max(53 - (CASE WHEN h60 // 256 = 0 THEN 0
                            ELSE length(bin(h60 // 256)) END)) AS INTEGER) AS rank
      FROM h GROUP BY l_returnflag, register),
    e AS (
      SELECT l_returnflag, CAST(count(*) AS INTEGER) AS n_registers_hit,
             CAST(sum(CAST(1 AS BIGINT) << (53 - rank)) +
                  (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS fp_sum
      FROM r GROUP BY l_returnflag)
    SELECT l_returnflag, n_registers_hit, fp_sum,
           CAST(floor(CASE WHEN n_registers_hit < 256 AND ($n / fp_sum) <= 640.0
                  THEN 256.0 * ln(256.0 / CAST(256 - n_registers_hit AS DOUBLE))
                  ELSE $n / fp_sum END + 0.5) AS BIGINT) AS estimate
    FROM e
    ORDER BY l_returnflag"""
  }

  /** q63: the Count-Min sketch rebuilt in SQL — the 4 universal-hash
    * rows come in as a VALUES list of (row, a, b) constants derived by
    * [[graft.operators.CountMin.cmA]]/[[graft.operators.CountMin.cmB]]
    * (same literal-string derivation the Spark plan uses), cells are
    * exact integer counts, estimates are min over rows.
    */
  private val q63 = {
    val perms = (0 until 4).map(i =>
      s"(${i}, ${graft.operators.CountMin.cmA(i)}, ${graft.operators.CountMin.cmB(i)})").mkString(", ")
    val h60 = "CAST(concat('0x', substr(md5(CAST(l_suppkey AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""
    WITH perm(row, a, b) AS (VALUES $perms),
    h AS (
      SELECT l_suppkey, $h60 % 1073741824 AS h30
      FROM lineitem WHERE l_suppkey IS NOT NULL),
    cells AS (
      SELECT p.row, ((p.a * h.h30 + p.b) % 2147483647) % 1024 AS bucket,
             CAST(count(*) AS BIGINT) AS cell_count
      FROM h CROSS JOIN perm p
      GROUP BY p.row, bucket),
    probe AS (
      SELECT DISTINCT l_suppkey, p.row,
             ((p.a * h30 + p.b) % 2147483647) % 1024 AS bucket
      FROM h CROSS JOIN perm p),
    est AS (
      SELECT pr.l_suppkey, CAST(min(c.cell_count) AS BIGINT) AS est_count
      FROM probe pr JOIN cells c ON pr.row = c.row AND pr.bucket = c.bucket
      GROUP BY pr.l_suppkey)
    SELECT e.l_suppkey, e.est_count, x.exact_count
    FROM est e JOIN (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS exact_count
      FROM lineitem GROUP BY l_suppkey) x ON e.l_suppkey = x.l_suppkey
    ORDER BY e.l_suppkey"""
  }

  private val q64noOrder = """
    SELECT o_orderpriority,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority"""

  private val q64 = s"$q64noOrder ORDER BY o_orderpriority"

  /** q65: the float-free z-score membership test in HUGEINT (mirrors
    * Spark's decimal(38,0) — both exact at these magnitudes).
    */
  private val q65 = """
    WITH li AS (
      SELECT l_returnflag,
             CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS HUGEINT) AS x
      FROM lineitem),
    st AS (
      SELECT l_returnflag,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS s,
             CAST(sum(x * x) AS HUGEINT) AS q
      FROM li GROUP BY l_returnflag)
    SELECT li.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN (st.n * li.x - st.s) * (st.n * li.x - st.s)
                            > 4 * (st.n * st.q - st.s * st.s)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(max(st.s) AS BIGINT) AS sum_cents
    FROM li JOIN st ON li.l_returnflag = st.l_returnflag
    GROUP BY li.l_returnflag
    ORDER BY li.l_returnflag"""

  /** q66: melt of q64's crosstab — UNION ALL per status column. */
  private val q66 = s"""
    WITH p AS ($q64noOrder)
    SELECT o_orderpriority, o_orderstatus, n FROM (
      SELECT o_orderpriority, 'F' AS o_orderstatus, n_f AS n FROM p
      UNION ALL SELECT o_orderpriority, 'O', n_o FROM p
      UNION ALL SELECT o_orderpriority, 'P', n_p FROM p)
    WHERE n > 0
    ORDER BY o_orderpriority, o_orderstatus"""

  private val q67 = """
    SELECT CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 5000000) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 5000000) * 50000 AS BIGINT) AS bucket_lo
    FROM orders
    GROUP BY bucket, bucket_lo
    ORDER BY bucket"""

  /** q68: decontamination recomputed from the shared shingle fragment —
    * benchmark = every 50th doc, LEFT JOIN membership probe.
    */
  private val q68 = s"""
    WITH $shingleRows,
    b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0)
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS contamination
    FROM c LEFT JOIN b ON c.shingle = b.shingle
    GROUP BY c.doc_id
    ORDER BY c.doc_id"""

  /** q69: raw (non-distinct) 3-gram counts per doc; NULL ratio for
    * sub-3-token docs.
    */
  private val q69 = s"""
    WITH toks AS ($lowerToks),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk) - 1),
                                   i -> array_to_string(tk[i:i+2], ' '))) AS gram
      FROM toks WHERE len(tk) >= 3),
    a AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS total,
             CAST(count(DISTINCT gram) AS BIGINT) AS dist
      FROM g GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(a.total, 0) AS n_grams,
           coalesce(a.dist, 0) AS n_distinct,
           round(CAST(a.total - a.dist AS DOUBLE) / a.total, 6) AS rep_ratio
    FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
    ORDER BY d.doc_id"""

  private val q70 = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS INTEGER) AS gid,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
    ORDER BY gid, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST"""

  private val q71 = """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_o_custkey,
           CAST(sum(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS domain_o_orderstatus,
           CAST(sum(CASE WHEN length(o_orderpriority) > 20 THEN 1 ELSE 0 END) AS BIGINT) AS len_o_orderpriority,
           CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_o_totalprice,
           CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND (o_totalprice < 0.0 OR o_totalprice > 450000.0) THEN 1 ELSE 0 END) AS BIGINT) AS range_o_totalprice
    FROM orders"""

  private val q72 = """
    WITH d AS (
      SELECT doc_id, CAST(n_chars * 37 % 9000 + 1000 AS BIGINT) AS duration_ms
      FROM documents),
    f AS (
      SELECT doc_id,
             unnest(range(0, greatest(duration_ms - 1, 0) + 1, 750)) AS off
      FROM d)
    SELECT doc_id, CAST(off AS BIGINT) AS frame_offset_ms,
           CAST(off // 750 AS INTEGER) AS frame_idx
    FROM f
    ORDER BY doc_id, frame_idx"""

  private val q73 = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
      FROM orders GROUP BY day)
    SELECT day,
           round(CAST(rev_c AS DOUBLE) / 100.0, 2) AS revenue,
           round(CAST(sum(rev_c) OVER w AS DOUBLE) / 100.0, 2) AS revenue_7d,
           CAST(count(*) OVER w AS BIGINT) AS days_in_window
    FROM daily
    WINDOW w AS (ORDER BY day RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    ORDER BY day"""

  private val q74 = """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_orders,
             round(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
      FROM orders GROUP BY day),
    b AS (
      SELECT min(CAST(o_orderdate AS DATE)) AS lo, max(CAST(o_orderdate AS DATE)) AS hi
      FROM orders),
    s AS (
      SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS day
      FROM b)
    SELECT s.day,
           coalesce(d.n_orders, 0) AS n_orders,
           coalesce(d.revenue, 0.0) AS revenue
    FROM s LEFT JOIN daily d ON s.day = d.day
    ORDER BY s.day"""

  /** q75's oracle is the PLAIN join — the salt must be invisible. */
  private val q75 = """
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    ORDER BY s.s_nationkey"""

  /** q76: the per-group cap's survivor set recomputed from the same
    * auditable hash rank.
    */
  private val q76 = s"""
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY lang
               ORDER BY ${h60("concat('cap:', CAST(doc_id AS VARCHAR))")} ASC,
                        doc_id ASC) AS rn
      FROM documents)
    SELECT doc_id, lang, n_chars
    FROM r WHERE rn <= 60
    ORDER BY doc_id"""

  private val q77 = """
    WITH early AS (
      SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1994-01-01'),
    late AS (
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
    SELECT 'both' AS segment,
           CAST((SELECT count(*) FROM (SELECT o_custkey FROM early INTERSECT SELECT o_custkey FROM late)) AS BIGINT) AS n_customers
    UNION ALL
    SELECT 'early_only',
           CAST((SELECT count(*) FROM (SELECT o_custkey FROM early EXCEPT SELECT o_custkey FROM late)) AS BIGINT)
    UNION ALL
    SELECT 'late_only',
           CAST((SELECT count(*) FROM (SELECT o_custkey FROM late EXCEPT SELECT o_custkey FROM early)) AS BIGINT)
    ORDER BY segment"""

  /** q78: histogram quantiles recomputed — all-integer ranks/targets. */
  private val q78 = """
    WITH h AS (
      SELECT l_returnflag,
             CAST(floor(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) / 10000) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL
      GROUP BY l_returnflag, bucket),
    c AS (
      SELECT l_returnflag, bucket, n,
             sum(n) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
             sum(n) OVER (PARTITION BY l_returnflag) AS total
      FROM h)
    SELECT l_returnflag,
           CAST(min(CASE WHEN cum >= (total * 50 + 99) // 100 THEN bucket * 10000 END) AS BIGINT) AS p50_lo,
           CAST(min(CASE WHEN cum >= (total * 95 + 99) // 100 THEN bucket * 10000 END) AS BIGINT) AS p95_lo,
           CAST(min(CASE WHEN cum >= (total * 99 + 99) // 100 THEN bucket * 10000 END) AS BIGINT) AS p99_lo,
           CAST(max(total) AS BIGINT) AS n_rows
    FROM c
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""

  /** q79: the date_dim regenerated in SQL — same `%U` Sunday-week formula
    * (DuckDB `dayofweek` is already Sunday=0) and Weekend/Weekday split as
    * [[graft.jobs.DateDim]], joined to events on calendar date.
    */
  private val q79 = """
    WITH dim AS (
      SELECT CAST(d AS DATE) AS full_date,
             CASE WHEN dayofweek(CAST(d AS DATE)) IN (0, 6)
                  THEN 'Weekend' ELSE 'Weekday' END AS day_type,
             monthname(CAST(d AS DATE)) AS calendar_month_name,
             CAST((dayofyear(CAST(d AS DATE)) + 6 - dayofweek(CAST(d AS DATE))) // 7
                  AS VARCHAR) AS week_of_year
      FROM generate_series(DATE '2024-01-01', DATE '2024-12-31', INTERVAL 1 DAY) t(d))
    SELECT day_type, calendar_month_name, week_of_year,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT e.event_date) AS BIGINT) AS n_days
    FROM (SELECT CAST(ts AS DATE) AS event_date FROM events) e
    JOIN dim ON e.event_date = dim.full_date
    GROUP BY day_type, calendar_month_name, week_of_year
    ORDER BY day_type, calendar_month_name, week_of_year"""

  /** q80: incremental pairs == full-batch pairs that touch a new doc
    * (doc_id % 5 = 0) — reuses q22's signature/banding CTEs verbatim.
    */
  private val q80 = s"""
    WITH $shingleRows, $minhashSig
    SELECT id_a, id_b, est_jaccard
    FROM est
    WHERE est_jaccard >= 0.2 AND (id_a % 5 = 0 OR id_b % 5 = 0)
    ORDER BY id_a, id_b"""

  /** q81: incremental IVF == q36's frozen-codebook probe with centroids
    * picked from the index subset (vec_id % 5 <> 0) only, every vector
    * (index ∪ increment) assigned against that codebook, and the new
    * vectors (vec_id % 5 = 0, < 50) as the probe queries.
    */
  private val q81 = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 WHERE vec_id % 5 <> 0 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    qcell AS (
      SELECT vec_id AS query_id, qe AS qq, n2v AS qn2, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM (SELECT vec_id, qe, n2v FROM n2
            WHERE vec_id % 5 = 0 AND vec_id < 50) q CROSS JOIN cents),
    probes AS (SELECT query_id, qq, qn2, centroid_id FROM qcell WHERE rn <= 4),
    cand AS (
      SELECT query_id, id,
             round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
      WHERE a.id <> p.query_id),
    ranked AS (
      SELECT query_id, id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
      FROM cand)
    SELECT query_id, id, cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q82: incremental SimHash pairs == q23's batch pair set restricted
    * to pairs that touch a new doc (doc_id % 5 = 0), keeping the exact
    * integer hamming distance.
    */
  private val q82 = s"""
    WITH toks AS ($lowerToks),
    tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
    th AS (SELECT doc_id, ${h60("'simhash:' || t")} AS h FROM tok),
    bits AS (
      SELECT doc_id, b, sum(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
      FROM th CROSS JOIN (SELECT CAST(x AS INTEGER) AS b FROM range(60) t(x))
      GROUP BY doc_id, b),
    sig0 AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM bits GROUP BY doc_id),
    sigs AS (
      SELECT d.doc_id, coalesce(s.simhash, 0) AS simhash
      FROM documents d LEFT JOIN sig0 s ON d.doc_id = s.doc_id),
    chunks AS (
      SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS cv
      FROM sigs CROSS JOIN (SELECT CAST(x AS INTEGER) AS c FROM range(4) t(x))),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             a.simhash AS sim_a, b.simhash AS sim_b
      FROM chunks a JOIN chunks b
        ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id)
    SELECT id_a, id_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= 3
      AND (id_a % 5 = 0 OR id_b % 5 = 0)
    ORDER BY id_a, id_b"""

  /** q83: incremental embedding near-dup == the batch LSH-blocked pair
    * set (buckets from the same quantized plane literals as q27)
    * restricted to pairs touching a new vector (vec_id % 5 = 0).
    */
  private val q83 = s"""
    WITH planes(t, b, qc) AS (VALUES $q27Planes),
    emb AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS lx,
             $quantize AS qe
      FROM embeddings),
    n2 AS (
      SELECT vec_id, lx, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM emb),
    buckets AS (
      SELECT vec_id, t,
             CAST(sum(CASE WHEN CAST(list_sum(list_transform(range(1, 65), i -> lx[i] * qc[i])) AS BIGINT) >= 0
                      THEN (1 << b) ELSE 0 END) AS INTEGER) AS bucket
      FROM n2 CROSS JOIN planes
      GROUP BY vec_id, t),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
      WHERE a.vec_id < b.vec_id
        AND (a.vec_id % 5 = 0 OR b.vec_id % 5 = 0)),
    paired AS (
      SELECT cand.id_a, cand.id_b,
             av.qe AS aq, av.n2v AS an2, bv.qe AS bq, bv.n2v AS bn2
      FROM cand
      JOIN n2 av ON av.vec_id = cand.id_a
      JOIN n2 bv ON bv.vec_id = cand.id_b)
    SELECT id_a, id_b, round(${qcos("aq", "bq", "an2", "bn2")}, 6) AS cosine
    FROM paired
    WHERE round(${qcos("aq", "bq", "an2", "bn2")}, 6) >= 0.2
    ORDER BY id_a, id_b"""

  /** q84: incrementally-merged vocabulary == full-corpus df (df over
    * disjoint doc sets is additive), so the new docs' tf-idf against
    * the merged vocab equals the batch computation restricted to them.
    * Same token CTE as q58.
    */
  private val q84 = """
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(coalesce(text, '')), '\s+')) AS term
      FROM documents),
    t AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    d AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df_docs FROM t GROUP BY term),
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents)
    SELECT t.doc_id, t.term, t.tf, d.df_docs,
           round(CAST(t.tf AS DOUBLE) * ln(CAST(nd AS DOUBLE) / CAST(d.df_docs AS DOUBLE)), 6) AS tfidf
    FROM t JOIN d ON t.term = d.term CROSS JOIN n
    WHERE t.doc_id % 5 = 0 AND t.doc_id < 1000
    ORDER BY t.doc_id, t.term"""

  /** q85: incremental labels (old labels + new-doc pair edges) == full
    * connected components over the whole pair set — q55's recursive CTE
    * up to `cc`, emitted as raw (id, comp) labels.
    */
  private val q85 = s"""
    ${q48Chunks.replaceFirst("WITH canon", "WITH RECURSIVE canon")}
    , cset AS (
      SELECT DISTINCT doc_id, chunk_md5 FROM chunks),
    sized AS (
      SELECT doc_id, chunk_md5,
             count(*) OVER (PARTITION BY doc_id) AS n_chunks
      FROM cset),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sized a JOIN sized b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING round(CAST(count(*) AS DOUBLE) / least(min(a.n_chunks), min(b.n_chunks)), 6) >= 0.5),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id)
    SELECT id, CAST(min(comp) AS BIGINT) AS comp
    FROM walk GROUP BY id
    ORDER BY id"""

  /** q86: fingerprint-index incremental canonical dedup == full-corpus
    * canonical dedup restricted to the batch (monotonic 80/20 id split,
    * so the indexed canonical IS the global group minimum).
    */
  private val q86 = s"""
    WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
    g AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY $normFp) AS canonical_id
      FROM documents)
    SELECT doc_id, canonical_id, doc_id <> canonical_id AS is_duplicate
    FROM g CROSS JOIN cut
    WHERE doc_id > c
    ORDER BY doc_id"""

  /** q87: tombstone-excluded incremental near-dup == the from-scratch
    * batch pair set over the corpus minus the deleted slice (index docs
    * with doc_id % 7 = 3), restricted to pairs touching a new doc —
    * q80's CTEs with the deleted docs filtered out of the corpus at the
    * source.
    */
  private val q87 = s"""
    WITH ${shingleRows.replace("FROM documents",
      "FROM documents WHERE NOT (doc_id % 5 <> 0 AND doc_id % 7 = 3)")}, $minhashSig
    SELECT id_a, id_b, est_jaccard
    FROM est
    WHERE est_jaccard >= 0.2 AND (id_a % 5 = 0 OR id_b % 5 = 0)
    ORDER BY id_a, id_b"""

  /** q88: deleteNodes over an existing labeling == connected components
    * over the pair graph minus every edge touching a deleted doc
    * (doc_id % 7 = 3) — q85's recursive CTE with the edge filter.
    */
  private val q88 = s"""
    ${q48Chunks.replaceFirst("WITH canon", "WITH RECURSIVE canon")}
    , cset AS (
      SELECT DISTINCT doc_id, chunk_md5 FROM chunks),
    sized AS (
      SELECT doc_id, chunk_md5,
             count(*) OVER (PARTITION BY doc_id) AS n_chunks
      FROM cset),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sized a JOIN sized b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING round(CAST(count(*) AS DOUBLE) / least(min(a.n_chunks), min(b.n_chunks)), 6) >= 0.5),
    live AS (
      SELECT id_a, id_b FROM pairs
      WHERE id_a % 7 <> 3 AND id_b % 7 <> 3),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM live
      UNION
      SELECT id_b, id_a FROM live),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id)
    SELECT id, CAST(min(comp) AS BIGINT) AS comp
    FROM walk GROUP BY id
    ORDER BY id"""

  /** q89: mixture sampling to a token budget — acceptance rates derived
    * in-query from per-domain token mass (`least(1, budget·weight/dt)`),
    * then q53's u01 draw. Head domains cap at 1 at small SF; every rate
    * is fractional at sf0.1 — both branches oracle-covered.
    */
  private val q89 = s"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT) AS n_tokens
      FROM documents),
    tot AS (
      SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS dt FROM t GROUP BY source),
    r AS (
      SELECT source,
             least(1.0, 20000.0 * (CASE WHEN source = 'src0' THEN 0.5
                                        WHEN source = 'src1' THEN 0.3
                                        ELSE 0.01 END) / dt) AS rate
      FROM tot)
    SELECT t.doc_id, t.lang, t.source, t.n_tokens
    FROM t JOIN r ON t.source = r.source
    WHERE CAST(${h60("'mixture:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
          / 1152921504606846976.0 < r.rate
    ORDER BY t.doc_id"""

  /** q90: exact substring-span dedup (k = 8): every 8-token window
    * hashed (h60 of the space-joined lowercased shingle), windows whose
    * hash occurs ≥ 2 times corpus-wide marked, marked positions merged
    * into maximal spans by the gaps-and-islands window (`pos − lag ≤ k`
    * ⇒ same island). 1-based inclusive token indices.
    */
  private val q90 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(range(1, len(tk) - 6)) AS pos,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> md5(array_to_string(list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
      FROM t),
    sh AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM sh0),
    d AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM sh),
    p AS (SELECT doc_id, pos FROM d WHERE c >= 2),
    mk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM p),
    g AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
      FROM mk)
    SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
           max(pos) + 7 - min(pos) + 1 AS span_tokens
    FROM g GROUP BY doc_id, grp
    ORDER BY doc_id, span_start"""

  /** q91: keep-one-copy excision — q90's shingle pipeline, but marking
    * `row_number ≥ 2` within each hash (ordered by `(doc_id, pos)` — the
    * corpus-first occurrence keeps its text), islands merged as in q90,
    * then every token outside a span re-joined by single spaces. Pure
    * copies of earlier docs collapse to ''.
    */
  private val q91 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(range(1, len(tk) - 6)) AS pos,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> md5(array_to_string(list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
      FROM t),
    sh AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM sh0),
    r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM sh),
    p AS (SELECT doc_id, pos FROM r WHERE rn >= 2),
    mk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM p),
    g AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
      FROM mk),
    sp AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      FROM g GROUP BY doc_id, grp),
    toks AS (
      SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos, unnest(tk) AS tok
      FROM t),
    keep AS (
      SELECT tk0.doc_id, tk0.pos, tk0.tok
      FROM toks tk0
      WHERE NOT EXISTS (SELECT 1 FROM sp
                        WHERE sp.doc_id = tk0.doc_id
                          AND tk0.pos BETWEEN sp.s AND sp.e)),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
             count(*) AS kept
      FROM keep GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n FROM t)
    SELECT b.doc_id, coalesce(a.txt, '') AS text_deduped,
           b.n - CAST(coalesce(a.kept, 0) AS BIGINT) AS n_tokens_removed
    FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
    ORDER BY b.doc_id"""

  /** q92: incremental substring spans — q91's rn-marked span pipeline
    * over the FULL corpus, restricted to batch docs (`doc_id >` the
    * 80% cut): with monotonic ids this is exactly what the index-probe
    * incremental form computes for the batch.
    */
  private val q92 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(range(1, len(tk) - 6)) AS pos,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> md5(array_to_string(list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
      FROM t),
    sh AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM sh0),
    r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM sh),
    p AS (SELECT doc_id, pos FROM r, cut WHERE rn >= 2 AND doc_id > c),
    mk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM p),
    g AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
      FROM mk)
    SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
           max(pos) + 7 - min(pos) + 1 AS span_tokens
    FROM g GROUP BY doc_id, grp
    ORDER BY doc_id, span_start"""

  /** q93: span-level decontamination — corpus (doc_id % 50 ≠ 0)
    * occurrences whose window hash appears anywhere in the benchmark
    * (doc_id % 50 = 0), islands merged as in q90.
    */
  private val q93 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(range(1, len(tk) - 6)) AS pos,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> md5(array_to_string(list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
      FROM t),
    sh AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM sh0),
    bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
    p AS (
      SELECT doc_id, pos FROM sh
      WHERE doc_id % 50 <> 0 AND h IN (SELECT h FROM bench)),
    mk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM p),
    g AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
      FROM mk)
    SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
           max(pos) + 7 - min(pos) + 1 AS span_tokens
    FROM g GROUP BY doc_id, grp
    ORDER BY doc_id, span_start"""

  /** q94: q93's spans cut out of the corpus text (q91's rebuild), every
    * corpus doc emitting one row.
    */
  private val q94 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    sh0 AS (
      SELECT doc_id,
             unnest(range(1, len(tk) - 6)) AS pos,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> md5(array_to_string(list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
      FROM t),
    sh AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM sh0),
    bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
    p AS (
      SELECT doc_id, pos FROM sh
      WHERE doc_id % 50 <> 0 AND h IN (SELECT h FROM bench)),
    mk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM p),
    g AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
      FROM mk),
    sp AS (
      SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      FROM g GROUP BY doc_id, grp),
    toks AS (
      SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos, unnest(tk) AS tok
      FROM t WHERE doc_id % 50 <> 0),
    keep AS (
      SELECT tk0.doc_id, tk0.pos, tk0.tok
      FROM toks tk0
      WHERE NOT EXISTS (SELECT 1 FROM sp
                        WHERE sp.doc_id = tk0.doc_id
                          AND tk0.pos BETWEEN sp.s AND sp.e)),
    agg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
             count(*) AS kept
      FROM keep GROUP BY doc_id),
    base AS (
      SELECT doc_id, CAST(len(tk) AS BIGINT) AS n
      FROM t WHERE doc_id % 50 <> 0)
    SELECT b.doc_id, coalesce(a.txt, '') AS text_clean,
           b.n - CAST(coalesce(a.kept, 0) AS BIGINT) AS n_tokens_removed
    FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
    ORDER BY b.doc_id"""

  /** q95: deterministic token-budget shards — the one-global-window
    * cumsum over the h60 shuffle order (tractable at oracle SF; the
    * operator computes the identical sum distributed).
    */
  private val q95 = s"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT) AS n_tokens,
             ${h60("'shard:' || CAST(doc_id AS VARCHAR)")} AS u
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (ORDER BY u, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 4000 AS BIGINT) AS shard_id
    FROM c ORDER BY doc_id"""

  /** q96: deletion-aware incremental spans — q92's split with the
    * doc_id % 7 = 3 slice of the OLD side deleted. The oracle is the
    * from-scratch keep-one-copy marking over the LIVE corpus
    * (old minus deleted, plus the fresh batch) restricted to the
    * batch: delete-then-probe must equal build-without.
    */
  private val q96 = s"""
    WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
    live AS (
      SELECT doc_id, text FROM documents, cut
      WHERE doc_id > c OR doc_id % 7 <> 3),
    t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM live),
    sh0 AS (
      SELECT doc_id,
             unnest(range(1, len(tk) - 6)) AS pos,
             unnest(list_transform(range(1, len(tk) - 6),
                    i -> md5(array_to_string(list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
      FROM t),
    sh AS (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM sh0),
    r AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM sh),
    p AS (SELECT doc_id, pos FROM r, cut WHERE rn >= 2 AND doc_id > c),
    mk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM p),
    g AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
      FROM mk)
    SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
           max(pos) + 7 - min(pos) + 1 AS span_tokens
    FROM g GROUP BY doc_id, grp
    ORDER BY doc_id, span_start"""

  /** q97: ANN takedown — q81's frozen-codebook probe with the
    * vec_id % 7 = 3 slice of the INDEXED vectors dropped from the
    * candidate set (the centroids stay the pre-delete pick, exactly as
    * the engine freezes the quantizer through deletions).
    */
  private val q97 = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 WHERE vec_id % 5 <> 0 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg
      WHERE rn = 1 AND NOT (vec_id % 5 <> 0 AND vec_id % 7 = 3)),
    qcell AS (
      SELECT vec_id AS query_id, qe AS qq, n2v AS qn2, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM (SELECT vec_id, qe, n2v FROM n2
            WHERE vec_id % 5 = 0 AND vec_id < 50) q CROSS JOIN cents),
    probes AS (SELECT query_id, qq, qn2, centroid_id FROM qcell WHERE rn <= 4),
    cand AS (
      SELECT query_id, id,
             round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
      WHERE a.id <> p.query_id),
    ranked AS (
      SELECT query_id, id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
      FROM cand)
    SELECT query_id, id, cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q98: incremental shard export == the one-shot cumsum under
    * DAY-MAJOR order (day, u, doc_id) — day 2 continues filling day
    * 1's open shard; already-shipped shards never reshuffle.
    */
  private val q98 = s"""
    WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
    t AS (
      SELECT doc_id, lang,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT) AS n_tokens,
             ${h60("'shard:' || CAST(doc_id AS VARCHAR)")} AS u,
             CASE WHEN doc_id > c THEN 1 ELSE 0 END AS d
      FROM documents, cut),
    cm AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (ORDER BY d, u, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 4000 AS BIGINT) AS shard_id
    FROM cm ORDER BY doc_id"""

  /** q99: hashed-BoW linear score — the weight vector regenerates
    * in-SQL (`h60('qw:'||bucket) mod 2001 − 1000`), bucket =
    * `h60(lower(token)) mod 256`; exact integer sum per document.
    * NULL text → NULL score + failed gate; token-less text scores 0.
    */
  private val q99 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
    wt AS (
      SELECT doc_id,
             ${h60(s"'qw:' || CAST(${h60("lower(w)")} % 256 AS VARCHAR)")}
               % 2001 - 1000 AS wv
      FROM tok),
    sc AS (SELECT doc_id, CAST(sum(wv) AS BIGINT) AS s FROM wt GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(sc.s, 0) END AS bow_score,
           CASE WHEN d.text IS NULL THEN FALSE
                ELSE coalesce(sc.s, 0) >= 0 END AS quality_pass
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    ORDER BY d.doc_id"""

  /** q100: BPE vocabulary induction — the 8-merge training chain as
    * generated MATERIALIZED CTEs (without materialization the
    * seg→best→seg lineage inlines exponentially). Each iteration
    * mirrors the engine exactly: adjacent-pair counts weighted by word
    * count, argmax with the pair-string ascending tie-break,
    * left-to-right non-overlapping `replace` on the space-delimited
    * segmentation.
    */
  /** The k-iteration BPE TRAINING chain as a WITH-body fragment
    * (`tok`, `w`, `seg1..segk`, `pc1..pck`, `best1..bestk`) — shared
    * by q100 (the trace) and q101 (segmentation uses the learned
    * `best{i}` rules).
    */
  private def bpeTrainingCtes(k: Int): String = {
    val sb = new StringBuilder(s"""
      WITH tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> ''),
      w AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM tok
        WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word),
      seg1 AS MATERIALIZED (
        SELECT word, cnt,
               ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> ' AS s
        FROM w)""")
    for (i <- 1 to k) {
      sb.append(s""",
      pc$i AS (
        SELECT p, sum(cnt) AS c FROM (
          SELECT cnt, unnest(list_transform(range(1, len(l)),
                 j -> l[j] || ' ' || l[j + 1])) AS p
          FROM (SELECT cnt, string_split(trim(s), ' ') AS l FROM seg$i))
        GROUP BY p),
      best$i AS MATERIALIZED (
        SELECT p, CAST(c AS BIGINT) AS c FROM pc$i
        ORDER BY c DESC, p ASC LIMIT 1)""")
      if (i < k) sb.append(s""",
      seg${i + 1} AS MATERIALIZED (
        SELECT word, cnt,
               replace(s, ' ' || (SELECT p FROM best$i) || ' ',
                          ' ' || (SELECT replace(p, ' ', '') FROM best$i) || ' ') AS s
        FROM seg$i)""")
    }
    sb.toString
  }

  private val q100: String = {
    val k = 8
    val unions = (1 to k).map(i =>
      s"SELECT $i AS rank, p AS pair, replace(p, ' ', '') AS merged, c AS cnt FROM best$i")
      .mkString(" UNION ALL ")
    bpeTrainingCtes(k) + s" SELECT * FROM ($unions) ORDER BY rank"
  }

  /** q101: BPE segmentation end-to-end — the q100 training chain, then
    * the learned rules applied to ALL word types (out-of-alphabet
    * words stay one unsplit symbol + marker), corpus tokens joined to
    * the type→subwords map and reassembled in position order. Per-doc
    * output: subword count + an md5 fingerprint of the joined
    * segmentation (compact, still hash-exact).
    */
  private def bpeSegmentSql(k: Int): String = {
    val sb = new StringBuilder(bpeTrainingCtes(k))
    sb.append(s""",
      t AS (
        SELECT doc_id, CASE WHEN text IS NULL OR trim(text) = '' THEN []
                            ELSE string_split_regex(trim(text), '\\s+') END AS tk
        FROM documents),
      tokpos AS (
        SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
               unnest(list_transform(range(1, len(tk) + 1), i -> lower(tk[i]))) AS word
        FROM t),
      tseg1 AS MATERIALIZED (
        SELECT word, CASE WHEN regexp_matches(word, '^[a-z]+$$')
                          THEN ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') || '</w> '
                          ELSE ' ' || word || ' </w> ' END AS s
        FROM (SELECT DISTINCT word FROM tokpos))""")
    for (i <- 1 to k) sb.append(s""",
      tseg${i + 1} AS MATERIALIZED (
        SELECT word, replace(s, ' ' || (SELECT p FROM best$i) || ' ',
                                ' ' || (SELECT replace(p, ' ', '') FROM best$i) || ' ') AS s
        FROM tseg$i)""")
    sb.append(s""",
      smap AS (SELECT word, string_split(trim(s), ' ') AS sub FROM tseg${k + 1}),
      perdoc AS (
        SELECT doc_id, flatten(list(sub ORDER BY pos)) AS bt
        FROM tokpos JOIN smap USING (word) GROUP BY doc_id)
      SELECT d.doc_id,
             CAST(coalesce(len(bt), 0) AS BIGINT) AS n_bpe_tokens,
             md5(coalesce(array_to_string(bt, ' '), '')) AS bpe_fp
      FROM documents d LEFT JOIN perdoc USING (doc_id)
      ORDER BY d.doc_id""")
    sb.toString
  }

  private val q101: String = bpeSegmentSql(8)

  /** Unigram-LM training chain (mirrors [[graft.operators.UnigramLm]]):
    * admitted word types, substring seed (all singles + top-`topM`
    * multis), then per EM round a Q10 log2 cost table (the q148
    * recursive-CTE kernel mirror), the edge table (every vocab piece
    * occurrence in every type), a position-unrolled Viterbi DP with
    * the (cost, path) tie-break, and the integer recount with the
    * singles coverage floor. Emits CTEs up to `v{rounds+1}` (the final
    * vocabulary) and `lg{rounds+1}` (its cost logs).
    */
  private def unigramCtes(maxPieceLen: Int, topM: Int, rounds: Int,
      maxWordLen: Int): String = {
    val grid = s"""unnest(flatten(list_transform(
        range(1, least(length(word), $maxPieceLen) + 1),
        l -> list_transform(range(1, length(word) - l + 2),
               i -> {'i': i, 'l': l}))))"""
    def logChain(r: Int, vocab: String): String = s""",
      vals$r AS (SELECT DISTINCT v FROM (
        SELECT cnt AS v FROM $vocab
        UNION ALL SELECT CAST(sum(cnt) AS BIGINT) FROM $vocab)),
      lg${r}0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals$r),
      lg${r}i(v, i, x, r) AS (
        SELECT v, 0,
               CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
               CAST(m AS BIGINT)
        FROM lg${r}0
        UNION ALL
        SELECT v, i + 1,
               CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
               CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
        FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lg${r}i WHERE i < 10)),
      lg$r AS (SELECT v, r FROM lg${r}i WHERE i = 10)"""
    val sb = new StringBuilder(s"""
      WITH RECURSIVE tok AS (
        SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> ''),
      w AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM tok
        WHERE regexp_matches(word, '^[a-z]+$$')
          AND length(word) <= $maxWordLen
        GROUP BY word),
      subs AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
          SELECT cnt, substr(word, s.i, s.l) AS piece FROM (
            SELECT cnt, word, $grid AS s FROM w))
        GROUP BY piece),
      v1 AS MATERIALIZED (
        SELECT piece, cnt FROM subs WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
          SELECT piece, cnt, row_number() OVER (ORDER BY cnt DESC, piece) AS rn
          FROM subs WHERE length(piece) > 1)
        WHERE rn <= $topM)""")
    for (r <- 1 to rounds) {
      sb.append(logChain(r, s"v$r"))
      sb.append(s""",
      c$r AS MATERIALIZED (
        SELECT p.piece,
               (SELECT l.r FROM lg$r l
                WHERE l.v = (SELECT CAST(sum(cnt) AS BIGINT) FROM v$r))
               - lp.r AS cost
        FROM v$r p JOIN lg$r lp ON lp.v = p.cnt),
      e${r}0 AS (
        SELECT word, $grid AS s FROM (SELECT word FROM w)),
      e$r AS MATERIALIZED (
        SELECT g.word, g.s.i - 1 AS i0, g.s.i - 1 + g.s.l AS j,
               substr(g.word, g.s.i, g.s.l) AS piece, c.cost
        FROM e${r}0 g JOIN c$r c ON c.piece = substr(g.word, g.s.i, g.s.l)),
      d${r}p0 AS (
        SELECT word, 0 AS j, CAST(0 AS BIGINT) AS cost, '' AS path FROM w)""")
      for (k <- 1 to maxWordLen) sb.append(s""",
      d${r}p$k AS MATERIALIZED (
        SELECT * FROM d${r}p${k - 1}
        UNION ALL
        SELECT word, j, cost, path FROM (
          SELECT e.word, e.j, d.cost + e.cost AS cost,
                 d.path || ' ' || e.piece AS path,
                 row_number() OVER (PARTITION BY e.word
                   ORDER BY d.cost + e.cost, d.path || ' ' || e.piece) AS rn
          FROM d${r}p${k - 1} d
          JOIN e$r e ON e.word = d.word AND e.i0 = d.j AND e.j = $k)
        WHERE rn = 1)""")
      sb.append(s""",
      seg$r AS MATERIALIZED (
        SELECT w.word, w.cnt, coalesce(dd.path, ' ' || w.word) AS path
        FROM w LEFT JOIN (
          SELECT word, path FROM d${r}p$maxWordLen WHERE j = length(word)) dd
          ON dd.word = w.word),
      rc${r + 1} AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS cnt FROM (
          SELECT cnt, unnest(string_split(trim(path), ' ')) AS piece
          FROM seg$r)
        GROUP BY piece),
      v${r + 1} AS MATERIALIZED (
        SELECT piece, cnt FROM rc${r + 1}
        UNION ALL
        SELECT piece, CAST(1 AS BIGINT) AS cnt FROM v1
        WHERE length(piece) = 1
          AND piece NOT IN (SELECT piece FROM rc${r + 1}))""")
    }
    sb.append(logChain(rounds + 1, s"v${rounds + 1}"))
    sb.toString
  }

  /** q169: the final unigram vocabulary with exact Q10 costs. */
  private val q169: String = {
    val R = 3 // rounds + 1
    unigramCtes(maxPieceLen = 4, topM = 128, rounds = 2, maxWordLen = 16) + s"""
    SELECT v.piece, v.cnt,
           (SELECT l.r FROM lg$R l
            WHERE l.v = (SELECT CAST(sum(cnt) AS BIGINT) FROM v$R))
           - lp.r AS cost_fp
    FROM v$R v JOIN lg$R lp ON lp.v = v.cnt
    ORDER BY v.cnt DESC, v.piece"""
  }

  /** q170: unigram segmentation end-to-end — the q169 chain, the final
    * cost table, then the inference DP over ALL corpus word types
    * (fallback to one unsplit piece when the DP never reaches the
    * word's end: out-of-alphabet chars or length > 16), `</w>` marker
    * per word, positional reassembly, md5 fingerprint per doc.
    */
  private def unigramSegmentSql(topM: Int): String = {
    val R = 3
    val sb = new StringBuilder(
      unigramCtes(maxPieceLen = 4, topM = topM, rounds = 2, maxWordLen = 16))
    sb.append(s""",
      cf AS MATERIALIZED (
        SELECT p.piece,
               (SELECT l.r FROM lg$R l
                WHERE l.v = (SELECT CAST(sum(cnt) AS BIGINT) FROM v$R))
               - lp.r AS cost
        FROM v$R p JOIN lg$R lp ON lp.v = p.cnt),
      tt AS (
        SELECT doc_id, CASE WHEN text IS NULL OR trim(text) = '' THEN []
                            ELSE string_split_regex(trim(text), '\\s+') END AS tk
        FROM documents),
      tokpos AS (
        SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos,
               unnest(list_transform(range(1, len(tk) + 1), i -> lower(tk[i]))) AS word
        FROM tt),
      ityp AS (SELECT DISTINCT word FROM tokpos),
      ie0 AS (
        SELECT word, unnest(flatten(list_transform(
            range(1, least(length(word), 4) + 1),
            l -> list_transform(range(1, length(word) - l + 2),
                   i -> {'i': i, 'l': l})))) AS s
        FROM ityp WHERE length(word) <= 16),
      ie AS MATERIALIZED (
        SELECT g.word, g.s.i - 1 AS i0, g.s.i - 1 + g.s.l AS j,
               substr(g.word, g.s.i, g.s.l) AS piece, c.cost
        FROM ie0 g JOIN cf c ON c.piece = substr(g.word, g.s.i, g.s.l)),
      idp0 AS (
        SELECT word, 0 AS j, CAST(0 AS BIGINT) AS cost, '' AS path FROM ityp)""")
    for (k <- 1 to 16) sb.append(s""",
      idp$k AS MATERIALIZED (
        SELECT * FROM idp${k - 1}
        UNION ALL
        SELECT word, j, cost, path FROM (
          SELECT e.word, e.j, d.cost + e.cost AS cost,
                 d.path || ' ' || e.piece AS path,
                 row_number() OVER (PARTITION BY e.word
                   ORDER BY d.cost + e.cost, d.path || ' ' || e.piece) AS rn
          FROM idp${k - 1} d
          JOIN ie e ON e.word = d.word AND e.i0 = d.j AND e.j = $k)
        WHERE rn = 1)""")
    sb.append(s""",
      smap AS (
        SELECT i.word,
               string_split(trim(coalesce(dd.path, ' ' || i.word) || ' </w>'), ' ')
                 AS sub
        FROM ityp i LEFT JOIN (
          SELECT word, path FROM idp16 WHERE j = length(word)) dd
          ON dd.word = i.word),
      perdoc AS (
        SELECT doc_id, flatten(list(sub ORDER BY pos)) AS bt
        FROM tokpos JOIN smap USING (word) GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(coalesce(len(bt), 0) AS BIGINT) AS n_unigram_tokens,
           md5(coalesce(array_to_string(bt, ' '), '')) AS unigram_fp
    FROM documents d LEFT JOIN perdoc USING (doc_id)
    ORDER BY d.doc_id""")
    sb.toString
  }

  private val q170: String = unigramSegmentSql(128)

  /** q180: tokenizer fertility SWEEP — the q174 comparison across the
    * vocab dial: three BPE merge counts and three unigram seed sizes,
    * each leg the full hash-verified segmentation chain as a
    * self-contained subquery, rolled up to (tokenizer, dial) fertility.
    * The crossover this sweeps for BASELINE.md is the real decision a
    * pipeline makes: which tokenizer compresses the corpus better AT a
    * given vocabulary budget.
    */
  private val q180: String = {
    def leg(tok: String, dial: Int, sql: String, cnt: String) = s"""
      SELECT '$tok' AS tokenizer, CAST($dial AS BIGINT) AS dial,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum($cnt) AS BIGINT) AS total_tokens,
             CAST(sum($cnt) * 1000 // count(*) AS BIGINT) AS avg_tokens_fp
      FROM ($sql)"""
    (Seq(2, 8, 16).map(k =>
      leg("bpe", k, bpeSegmentSql(k), "n_bpe_tokens")) ++
      Seq(32, 128, 256).map(m =>
        leg("unigram", m, unigramSegmentSql(m), "n_unigram_tokens")))
      .mkString(" UNION ALL ") + " ORDER BY tokenizer, dial"
  }

  /** q171: KMV bottom-k distinct estimate — bottom-k distinct h60 per
    * priority via row_number, then `(k−1)·2^60 // h_k` in HUGEINT
    * (mirrors [[graft.operators.ThetaSketch.estimate]]'s
    * decimal(38,0) floor-quotient).
    */
  private val q171 = """
    WITH h AS (
      SELECT o_orderpriority AS grp,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
      FROM orders WHERE o_custkey IS NOT NULL),
    d AS (SELECT DISTINCT grp, h FROM h),
    r AS (SELECT grp, h,
                 row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM d),
    bk AS (SELECT grp, h FROM r WHERE rn <= 128),
    agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_retained,
                   max(h) AS kth
            FROM bk GROUP BY grp)
    SELECT grp AS o_orderpriority, n_retained,
           CASE WHEN n_retained >= 128 THEN kth END AS kth_hash,
           CASE WHEN n_retained < 128 THEN n_retained
                ELSE CAST(CAST(127 AS HUGEINT) * 1152921504606846976 // kth
                       AS BIGINT) END AS est_distinct
    FROM agg
    ORDER BY o_orderpriority"""

  /** q172: theta-sketch set operations — per-side bottom-k, the
    * union's bottom-k, membership counts, and the integer
    * union/intersection/Jaccard estimators.
    */
  private val q172 = """
    WITH h AS (
      SELECT o_orderpriority AS grp,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
               AS BIGINT) AS h
      FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_orderpriority IN ('1-URGENT', '2-HIGH')),
    d AS (SELECT DISTINCT grp, h FROM h),
    r AS (SELECT grp, h,
                 row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM d),
    bk AS (SELECT grp, h FROM r WHERE rn <= 128),
    uni AS (SELECT DISTINCT h FROM bk),
    ur AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM uni),
    ubk AS (SELECT h FROM ur WHERE rn <= 128),
    uagg AS (SELECT CAST(count(*) AS BIGINT) AS ku, max(h) AS kth FROM ubk),
    est AS (SELECT ku,
                   CASE WHEN ku < 128 THEN ku
                        ELSE CAST(CAST(127 AS HUGEINT) * 1152921504606846976
                               // kth AS BIGINT) END AS est_union
            FROM uagg),
    flags AS (
      SELECT u.h,
             EXISTS (SELECT 1 FROM bk
                     WHERE grp = '1-URGENT' AND bk.h = u.h) AS ina,
             EXISTS (SELECT 1 FROM bk
                     WHERE grp = '2-HIGH' AND bk.h = u.h) AS inb
      FROM ubk u),
    common AS (
      SELECT CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common,
             CAST(sum(CASE WHEN ina AND NOT inb THEN 1 ELSE 0 END) AS BIGINT)
               AS onlya,
             CAST(sum(CASE WHEN inb AND NOT ina THEN 1 ELSE 0 END) AS BIGINT)
               AS onlyb
      FROM flags)
    SELECT 'urgent_vs_high' AS pair, c.n_common, e.est_union,
           CAST(CAST(c.n_common AS HUGEINT) * e.est_union // e.ku AS BIGINT)
             AS est_intersection,
           CAST(CAST(c.onlya AS HUGEINT) * e.est_union // e.ku AS BIGINT)
             AS est_only_a,
           CAST(CAST(c.onlyb AS HUGEINT) * e.est_union // e.ku AS BIGINT)
             AS est_only_b,
           c.n_common * CAST(1000000 AS BIGINT) // e.ku AS jaccard_fp
    FROM common c, est e"""

  /** q102: q82's incremental SimHash pair set with the indexed
    * doc_id % 7 = 3 slice deleted — pairs touching a deleted index doc
    * drop; new×new pairs are unaffected.
    */
  private val q102 = q82.replace(
    "AND (id_a % 5 = 0 OR id_b % 5 = 0)",
    """AND (id_a % 5 = 0 OR id_b % 5 = 0)
      AND NOT (id_a % 5 <> 0 AND id_a % 7 = 3)
      AND NOT (id_b % 5 <> 0 AND id_b % 7 = 3)""")

  /** q103: q83's incremental embedding pair set with the indexed
    * vec_id % 7 = 3 slice deleted.
    */
  private val q103 = q83.replace(
    "AND (a.vec_id % 5 = 0 OR b.vec_id % 5 = 0)",
    """AND (a.vec_id % 5 = 0 OR b.vec_id % 5 = 0)
        AND NOT (a.vec_id % 5 <> 0 AND a.vec_id % 7 = 3)
        AND NOT (b.vec_id % 5 <> 0 AND b.vec_id % 7 = 3)""")

  /** q104: corpus-version diff — v1 (drop % 5 = 0) vs v2 (drop
    * % 7 = 3, revise % 11 = 0 texts), classed added/removed/changed by
    * join presence + null-safe (IS DISTINCT FROM) fingerprint compare.
    */
  private val q104 = s"""
    WITH v1 AS (
      SELECT doc_id, $normFp AS fp FROM documents WHERE doc_id % 5 <> 0),
    v2t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN coalesce(text, '') || ' revised'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 3),
    v2 AS (SELECT doc_id, $normFp AS fp FROM v2t),
    j AS (
      SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
             v1.fp AS fo, v2.fp AS fn,
             v1.doc_id IS NOT NULL AS in_old, v2.doc_id IS NOT NULL AS in_new
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id)
    SELECT doc_id,
           CASE WHEN NOT in_old THEN 'added'
                WHEN NOT in_new THEN 'removed'
                WHEN fo IS DISTINCT FROM fn THEN 'changed' END AS change
    FROM j
    WHERE (NOT in_old) OR (NOT in_new) OR (fo IS DISTINCT FROM fn)
    ORDER BY doc_id"""

  /** q105: version reconciliation as vocabulary algebra — the Spark
    * side folds v1's df minus the retracted (removed ∪ changed) docs'
    * old-text df plus the admitted (added ∪ changed) docs' new-text
    * df; the oracle computes df over v2 DIRECTLY (same v1/v2
    * derivations as q104, same token CTE as q58/q84). Equality proves
    * the delta fold lands exactly on the target version's vocabulary.
    */
  private val q105 = """
    WITH v2t AS (
      SELECT doc_id,
             CASE WHEN doc_id % 11 = 0 THEN coalesce(text, '') || ' revised'
                  ELSE text END AS text
      FROM documents WHERE doc_id % 7 <> 3),
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(coalesce(text, '')), '\s+')) AS term
      FROM v2t),
    t AS (
      SELECT DISTINCT doc_id, term FROM toks WHERE term <> '')
    SELECT term, CAST(count(*) AS BIGINT) AS df_docs
    FROM t GROUP BY term ORDER BY term"""

  /** q106: q99's hashed-BoW score plus word-bigram features — the
    * bigram feature hash is the span family's 2-token window hash
    * (md5 h60 of the lowercased space-joined pair), the bucket and
    * stub-weight derivations identical to q99's.
    */
  private val q106 = s"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
    uni AS (
      SELECT doc_id,
             ${h60(s"'qw:' || CAST(${h60("lower(w)")} % 256 AS VARCHAR)")}
               % 2001 - 1000 AS wv
      FROM tok),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
               i -> lower(tk[i]) || ' ' || lower(tk[i + 1]))) AS b
      FROM t WHERE len(tk) >= 2),
    bi AS (
      SELECT doc_id,
             ${h60(s"'qw:' || CAST(${h60("b")} % 256 AS VARCHAR)")}
               % 2001 - 1000 AS wv
      FROM bg),
    sc AS (
      SELECT doc_id, CAST(sum(wv) AS BIGINT) AS s
      FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                ELSE coalesce(sc.s, 0) END AS bow_score,
           CASE WHEN d.text IS NULL THEN FALSE
                ELSE coalesce(sc.s, 0) >= 0 END AS quality_pass
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    ORDER BY d.doc_id"""

  /** q107: the engine assembles PNG/JPEG/GIF binaries from each
    * doc_id and parses them back with the native header kernel; the
    * oracle states the construction formulas directly, so hash
    * equality proves the parse inverts the assembly bit-exactly
    * (format branch, big/little-endian dims, trailer truncation).
    */
  private val q107 = """
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
           CAST(doc_id % 1000 + 16 AS BIGINT) AS width,
           CAST((doc_id * 7) % 1000 + 16 AS BIGINT) AS height,
           (doc_id % 7 = 0) AS truncated
    FROM documents
    ORDER BY doc_id"""

  /** q108: WAV/MP4 sibling of q107 — the engine assembles RIFF and
    * ISO-BMFF binaries from each doc_id and parses them back with the
    * native AvHeader kernel; the oracle restates the construction
    * formulas (including WAV's integer-division duration algebra
    * `data_bytes * 1000 // byte_rate` and MP4's
    * `units * 1000 // timescale` = (doc_id % 500) * 5).
    */
  private val q108 = """
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'mp4' END AS format,
           CASE WHEN doc_id % 2 = 0
             THEN CAST(1 + (doc_id % 4) // 2 AS BIGINT) END AS channels,
           CASE WHEN doc_id % 2 = 0
             THEN CAST(8000 + (doc_id % 16) // 2 * 1000 AS BIGINT)
             END AS sample_rate,
           CASE WHEN doc_id % 2 = 0
             THEN CAST((doc_id % 100 + 1) * 4 * 1000
               // ((1 + (doc_id % 4) // 2)
                  * (8000 + (doc_id % 16) // 2 * 1000) * 2) AS BIGINT)
             ELSE CAST((doc_id % 500) * 5 AS BIGINT) END AS duration_ms,
           (doc_id % 5 = 0) AS truncated
    FROM documents
    ORDER BY doc_id"""

  /** q109: Unicode NFC — the oracle rebuilds the same combining-mark /
    * precomposed / ASCII variants with `chr()` codepoints and runs
    * DuckDB's `nfc_normalize`; both engines implement the Unicode
    * standard's NFC and count lengths in code points, so the
    * normalized strings hash-match bit-for-bit.
    */
  private val q109 = """
    WITH v AS (
      SELECT doc_id,
        CASE CAST(doc_id % 4 AS INT)
          WHEN 0 THEN 'cafe' || chr(769) || ' menu'
          WHEN 1 THEN chr(233) || 'cole d' || chr(233) || 'j' || chr(224)
          WHEN 2 THEN 'facade plain ascii'
          ELSE 'A' || chr(778) || 'ngstro' || chr(776) || 'm' END ||
          ' #' || CAST(doc_id AS VARCHAR) AS raw
      FROM documents)
    SELECT doc_id,
           nfc_normalize(raw) AS nfc,
           CAST(length(raw) AS BIGINT) AS n_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
           (raw != nfc_normalize(raw)) AS changed
    FROM v
    ORDER BY doc_id"""

  /** q110: the oracle assembles the same synthetic HTML and runs the
    * IDENTICAL regex chain (every pattern RE2-compatible by design —
    * script/style with content, comments, tags, the six entities with
    * `&amp;` last, whitespace collapse) with the 'g' flag standing in
    * for Java's replace-all default.
    */
  private val q110 = """
    WITH h AS (
      SELECT doc_id,
        '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' ||
        '<style type="text/css">body { color: red; }</style>' ||
        '<script>var x = 1 < 2 && 3 > 2;</script></head><body>' ||
        CASE WHEN doc_id % 3 = 0 THEN '<!-- hidden comment -->' ELSE '' END ||
        '<p class="main">' || coalesce(text, '') ||
        '</p><div>Tom &amp; Jerry &lt;3 &quot;quoted&quot; ' ||
        '&#39;s&nbsp;end</div></body></html>' AS html
      FROM documents),
    c AS (
      SELECT doc_id,
        trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(regexp_replace(html,
            '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
            '(?s)<!--.*?-->', ' ', 'g'),
            '(?s)<[^>]+>', ' ', 'g'),
            '&lt;', '<', 'g'),
            '&gt;', '>', 'g'),
            '&quot;', '"', 'g'),
            '&#39;', '''', 'g'),
            '&nbsp;', ' ', 'g'),
            '&amp;', '&', 'g'),
          '\s+', ' ', 'g')) AS clean
      FROM h)
    SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_chars
    FROM c
    ORDER BY doc_id"""

  /** q111: the oracle assembles the same raw URLs and runs the
    * identical canonicalization chain — fragment drop, authority
    * extract + lower + $-anchored default-port strip (scoped to the
    * prefix by construction), substr re-concat, and the three
    * group-free utm rules.
    */
  private val q111 = """
    WITH r AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END ||
         'EXAMPLE' || CAST(doc_id % 50 AS VARCHAR) || '.COM' ||
         CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END ||
         '/Path/To/' || CAST(doc_id AS VARCHAR) ||
         CASE WHEN doc_id % 3 = 0
              THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
              WHEN doc_id % 3 = 1
              THEN '?id=' || CAST(doc_id AS VARCHAR) || '&utm_campaign=x'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN '#Section-' || CAST(doc_id AS VARCHAR) ELSE '' END
        ) AS url_raw
      FROM documents),
    f AS (
      SELECT doc_id,
        trim(regexp_replace(url_raw, '(?s)#.*', '')) AS nf
      FROM r),
    p AS (
      SELECT doc_id, nf,
        regexp_extract(nf, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*') AS pfx
      FROM f),
    c AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(lower(pfx), ':80$', ''), ':443$', '') ||
          substr(nf, length(pfx) + 1),
          '&utm_[a-z]+=[^&]*', '', 'g'),
          '\?utm_[a-z]+=[^&]*&', '?', 'g'),
          '\?utm_[a-z]+=[^&]*$', '') AS url_canon
      FROM p)
    SELECT doc_id, url_canon,
           regexp_extract(url_canon, '^[a-z]+://([^/:?#]+)', 1) AS host
    FROM c
    ORDER BY doc_id"""

  /** q112: sentence chunking — the oracle mirrors the marker insertion
    * (three group-free rules), the q106-style positional unnest, the
    * same blank-safe token count, the windowed cumulative-fill chunk
    * assignment, and the pos-ordered re-join.
    */
  private val q112 = """
    WITH m AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(coalesce(text, ''),
          '\. ', '.' || chr(1), 'g'), '! ', '!' || chr(1), 'g'),
          '\? ', '?' || chr(1), 'g') AS mt
      FROM documents),
    l AS (SELECT doc_id, string_split(mt, chr(1)) AS sl FROM m),
    s AS (
      SELECT doc_id,
        unnest(list_transform(range(1, len(sl) + 1),
          i -> {'pos': i, 'sent': sl[i]})) AS u
      FROM l),
    t AS (
      SELECT doc_id, u.pos AS pos, u.sent AS sent,
        CASE WHEN trim(u.sent) = '' THEN 0
             ELSE len(string_split_regex(trim(u.sent), '\s+')) END AS tok
      FROM s),
    c AS (
      SELECT doc_id, pos, sent, tok,
        CAST(floor((SUM(tok) OVER (PARTITION BY doc_id ORDER BY pos
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tok) / 64.0)
          AS BIGINT) AS chunk_no
      FROM t)
    SELECT doc_id, chunk_no,
           string_agg(sent, ' ' ORDER BY pos) AS chunk_text,
           CAST(SUM(tok) AS BIGINT) AS n_tokens
    FROM c
    GROUP BY doc_id, chunk_no
    ORDER BY doc_id, chunk_no"""

  /** q113: DSIR importance-resampling selection — the oracle re-runs
    * the whole pipeline in integer arithmetic: hashed unigram+bigram
    * buckets (q106's window idiom, mod 1024), per-slice bucket counts
    * with add-one smoothing, the fixed-point log2 as a 10-step
    * recursive CTE over `(x, r)` (bit-identical to `Dsir.log2Fp`'s
    * repeated squaring — no IEEE `ln` anywhere, libms disagree in the
    * last ulp), the per-document log-ratio score as a bucket join, and
    * the top-20% rank with the `(score desc, doc_id)` tie-break.
    */
  private def dsirSql(rawPred: String => String) = s"""
    WITH RECURSIVE t AS (
      SELECT doc_id, text,
             CASE WHEN text IS NULL OR trim(text) = '' THEN []
                  ELSE string_split_regex(trim(text), '\\s+') END AS tk
      FROM documents),
    uni AS (
      SELECT doc_id, ${h60("lower(w)")} % 1024 AS b
      FROM (SELECT doc_id, unnest(tk) AS w FROM t)),
    bi AS (
      SELECT doc_id, ${h60("p")} % 1024 AS b
      FROM (SELECT doc_id,
              unnest(list_transform(range(1, len(tk)),
                i -> lower(tk[i]) || ' ' || lower(tk[i + 1]))) AS p
            FROM t WHERE len(tk) >= 2)),
    feat AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
    ctt AS (SELECT b, count(*) AS ct FROM feat WHERE doc_id % 10 = 0 GROUP BY b),
    ctr AS (SELECT b, count(*) AS ct FROM feat
            WHERE ${rawPred("doc_id")} GROUP BY b),
    cts AS (
      SELECT s.b,
             coalesce(tt.ct, 0) + 1 AS nt,
             coalesce(rr.ct, 0) + 1 AS nr
      FROM range(0, 1024) s(b)
      LEFT JOIN ctt tt ON tt.b = s.b
      LEFT JOIN ctr rr ON rr.b = s.b),
    tot AS (
      SELECT (SELECT coalesce(sum(ct), 0) FROM ctt) + 1024 AS tt,
             (SELECT coalesce(sum(ct), 0) FROM ctr) + 1024 AS tr),
    vals AS (
      SELECT DISTINCT v FROM (
        SELECT nt AS v FROM cts UNION ALL SELECT nr FROM cts
        UNION ALL SELECT tt FROM tot UNION ALL SELECT tr FROM tot)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    w AS (
      SELECT c.b, lnt.r - ltt.r - lnr.r + ltr.r AS wv
      FROM cts c
      CROSS JOIN tot
      JOIN lg lnt ON lnt.v = c.nt
      JOIN lg lnr ON lnr.v = c.nr
      JOIN lg ltt ON ltt.v = tot.tt
      JOIN lg ltr ON ltr.v = tot.tr),
    sc AS (
      SELECT f.doc_id, CAST(sum(w.wv) AS BIGINT) AS s
      FROM feat f JOIN w ON w.b = f.b
      WHERE ${rawPred("f.doc_id")}
      GROUP BY f.doc_id),
    scored AS (
      SELECT d.doc_id,
             CASE WHEN d.text IS NULL THEN NULL ELSE coalesce(sc.s, 0) END AS s
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      WHERE ${rawPred("d.doc_id")}),
    rk AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM scored WHERE s IS NOT NULL),
    n AS (SELECT count(*) AS cnt FROM rk)
    SELECT sd.doc_id, sd.s AS dsir_score,
           coalesce(rk.r <= n.cnt * 20 // 100, FALSE) AS selected
    FROM scored sd
    CROSS JOIN n
    LEFT JOIN rk ON rk.doc_id = sd.doc_id
    ORDER BY sd.doc_id"""

  private val q113 = dsirSql(c => s"$c % 10 <> 0")

  /** q114: incremental DSIR — the engine maintains the raw-pool count
    * state additively (three daily batches merged, then a takedown
    * batch subtracted) and fits/scores/selects from the maintained
    * state; the oracle recomputes the SAME pipeline from scratch over
    * the reduced pool, so hash equality proves merge ∪ subtract is
    * exact, not approximate.
    */
  private val q114 = dsirSql(c => s"$c % 10 <> 0 AND $c % 13 <> 5")

  /** q115: CCNet char-LM perplexity terciles — hashed trigram counts
    * over the curated slice's lowercased code-point windows, add-one
    * smoothing (`(ct3+1)/(ct2+4096)`), the same recursive-CTE
    * fixed-point log2 as q113, per-document `Σ log2 p̂` as a bucket
    * join, the truncating-division per-window mean (DuckDB `//`
    * truncates toward zero exactly like Spark's `div`), and the
    * head/middle/tail split on the `(mean desc, doc_id)` rank.
    */
  private val q115 = s"""
    WITH RECURSIVE lt AS (
      SELECT doc_id, text, lower(text) AS t FROM documents),
    tri AS (
      SELECT doc_id,
             ${h60("substr(t, i, 3)")} % 4096 AS b3,
             ${h60("substr(t, i, 2)")} % 4096 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t) - 1)) AS i, t
            FROM lt WHERE length(t) >= 3)),
    big AS (
      SELECT doc_id, ${h60("substr(t, i, 2)")} % 4096 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t))) AS i, t
            FROM lt WHERE length(t) >= 2)),
    ct3 AS (SELECT b3 AS b, count(*) AS ct FROM tri
            WHERE doc_id % 10 = 0 GROUP BY b3),
    ct2 AS (SELECT b2 AS b, count(*) AS ct FROM big
            WHERE doc_id % 10 = 0 GROUP BY b2),
    vals AS (
      SELECT DISTINCT v FROM (
        SELECT coalesce(t3.ct, 0) + 1 AS v
        FROM range(0, 4096) s(b) LEFT JOIN ct3 t3 ON t3.b = s.b
        UNION ALL
        SELECT coalesce(t2.ct, 0) + 4096 AS v
        FROM range(0, 4096) s(b) LEFT JOIN ct2 t2 ON t2.b = s.b)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    w3 AS (
      SELECT s.b, lg.r AS wv
      FROM range(0, 4096) s(b)
      LEFT JOIN ct3 ON ct3.b = s.b
      JOIN lg ON lg.v = coalesce(ct3.ct, 0) + 1),
    w2 AS (
      SELECT s.b, lg.r AS wv
      FROM range(0, 4096) s(b)
      LEFT JOIN ct2 ON ct2.b = s.b
      JOIN lg ON lg.v = coalesce(ct2.ct, 0) + 4096),
    sc AS (
      SELECT tri.doc_id,
             CAST(sum(w3.wv - w2.wv) AS BIGINT) AS s
      FROM tri
      JOIN w3 ON w3.b = tri.b3
      JOIN w2 ON w2.b = tri.b2
      GROUP BY tri.doc_id),
    scored AS (
      SELECT l.doc_id,
             CASE WHEN l.text IS NULL THEN NULL
                  ELSE greatest(length(l.t) - 2, 0) END AS n_tri,
             CASE WHEN l.text IS NULL THEN NULL
                  ELSE coalesce(sc.s, 0) END AS s
      FROM lt l LEFT JOIN sc ON sc.doc_id = l.doc_id),
    rk AS (
      SELECT doc_id, s // n_tri AS lm_avg,
             row_number() OVER (ORDER BY s // n_tri DESC, doc_id) AS r
      FROM scored WHERE s IS NOT NULL AND n_tri > 0),
    n AS (SELECT count(*) AS cnt FROM rk)
    SELECT sd.doc_id,
           CAST(sd.n_tri AS BIGINT) AS n_tri,
           sd.s AS lm_score,
           rk.lm_avg AS lm_avg,
           CASE WHEN sd.s IS NULL THEN NULL
                WHEN sd.n_tri = 0 THEN 'tail'
                WHEN rk.r <= n.cnt // 3 THEN 'head'
                WHEN rk.r <= 2 * n.cnt // 3 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored sd
    CROSS JOIN n
    LEFT JOIN rk ON rk.doc_id = sd.doc_id
    ORDER BY sd.doc_id"""

  /** q116 — duplicate-line metrics: the identical five-line synthesis
    * (line 3 == line 1; line 5 == line 2 on even ids), then the same
    * list algebra as TextFunctions.dupLineStats. Character counts only
    * need set identity, so list_distinct's occurrence choice is
    * irrelevant.
    */
  private val q116 = s"""
    WITH body AS (
      SELECT doc_id,
             concat_ws(chr(10),
               substr(coalesce(text, ''), 1, 40),
               substr(coalesce(text, ''), 41, 40),
               substr(coalesce(text, ''), 1, 40),
               substr(coalesce(text, ''), 81, 40),
               CASE WHEN doc_id % 2 = 0 THEN substr(coalesce(text, ''), 41, 40)
                    ELSE substr(coalesce(text, ''), 121, 40) END) AS b
      FROM documents),
    lined AS (
      SELECT doc_id, b,
             string_split(b, chr(10)) AS lines,
             list_distinct(string_split(b, chr(10))) AS dlines
      FROM body)
    SELECT doc_id,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(dlines) AS BIGINT) AS distinct_lines,
           CAST(len(lines) - len(dlines) AS BIGINT) AS dup_lines,
           CAST(length(b) - (len(lines) - 1) AS BIGINT) AS line_chars,
           CAST(length(b) - (len(lines) - 1)
                - length(array_to_string(dlines, '')) AS BIGINT) AS dup_line_chars
    FROM lined
    ORDER BY doc_id"""

  /** q117 — corpus-wide paragraph dedup: identical five-paragraph
    * synthesis, first-(doc_id,pos) election per paragraph STRING (no
    * digest needed — grouping by the value is the same equivalence),
    * empty paragraphs always keep, ordered string_agg rebuild.
    * coalesce(...,'') mirrors Spark's concat_ws over an empty array for
    * docs that lose every paragraph.
    */
  /** body → paras → marked CTE chain of the paragraph-dedup family
    * (q117/q120/q121): the five-paragraph synthesis and first-
    * occurrence keep rule over an optionally-filtered documents set.
    */
  private def paraMarked(docsWhere: String) = s"""
    body AS (
      SELECT doc_id,
             concat_ws(chr(10) || chr(10),
               'subscribe to our newsletter',
               substr(coalesce(text, ''), 1, 60),
               'share-' || CAST(doc_id % 7 AS VARCHAR),
               substr(coalesce(text, ''), 61, 60),
               'copyright 2026') AS b
      FROM documents $docsWhere),
    paras AS (
      SELECT doc_id,
             unnest(string_split(b, chr(10) || chr(10))) AS para,
             generate_subscripts(string_split(b, chr(10) || chr(10)), 1) - 1 AS pos
      FROM body),
    marked AS (
      SELECT doc_id, para, pos,
             para = '' OR row_number() OVER (PARTITION BY para
               ORDER BY doc_id, pos) = 1 AS keep
      FROM paras)"""

  /** Rebuild tail shared by q117/q120/q121. */
  private def paraRebuild(finalWhere: String) = s"""
    SELECT doc_id,
           coalesce(string_agg(para, chr(10) || chr(10) ORDER BY pos)
                      FILTER (WHERE keep), '') AS text_dedup,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS n_dropped
    FROM marked $finalWhere
    GROUP BY doc_id
    ORDER BY doc_id"""

  private val q117 = s"""
    WITH ${paraMarked("")}
    ${paraRebuild("")}"""

  /** q120 — incremental paragraph dedup: the one-shot election over
    * the FULL corpus (postings ∪ batch is everything), restricted to
    * the 20%-id batch — the monotonic-id incremental contract.
    */
  private val q120 = s"""
    WITH cut AS (
      SELECT CAST(floor(max(doc_id) * 4 / 5) AS BIGINT) AS c FROM documents),
    ${paraMarked("")}
    ${paraRebuild("WHERE doc_id > (SELECT c FROM cut)")}"""

  /** q121 — paragraph takedown: election recomputed WITHOUT the
    * deleted indexed docs (doc_id % 7 = 3 below the cut), restricted
    * to the batch — delete-then-probe == build-without.
    */
  private val q121 = s"""
    WITH cut AS (
      SELECT CAST(floor(max(doc_id) * 4 / 5) AS BIGINT) AS c FROM documents),
    ${paraMarked(
      "WHERE NOT (doc_id <= (SELECT c FROM cut) AND doc_id % 7 = 3)")}
    ${paraRebuild("WHERE doc_id > (SELECT c FROM cut)")}"""

  /** q118 — SemDeDup: the q36 codebook pick + argmax assignment, then
    * q25's fixed-point pair cosine within each cluster and a
    * max-neighbor election over lower ids.
    */
  private val q118 = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    losers AS (
      SELECT b.id AS id_b,
             max(round(${qcos("a.aq", "b.aq", "a.an2", "b.an2")}, 6)) AS nn_cosine
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.id < b.id
      WHERE round(${qcos("a.aq", "b.aq", "a.an2", "b.an2")}, 6) >= 0.5
      GROUP BY b.id)
    SELECT s.id AS vec_id, s.centroid_id,
           l.nn_cosine IS NOT NULL AS sem_dup, l.nn_cosine
    FROM assigned s LEFT JOIN losers l ON s.id = l.id_b
    ORDER BY s.id"""

  /** q122 — incremental SemDeDup: codebook picked from the 80%-id
    * prefix ONLY (the frozen index), everyone assigned to it, pair
    * election restricted to batch probes — q118's algebra under the
    * incremental contract.
    */
  private val q122 = s"""
    WITH cut AS (
      SELECT CAST(floor(max(vec_id) * 4 / 5) AS BIGINT) AS c FROM embeddings),
    base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 WHERE vec_id <= (SELECT c FROM cut)
            ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    losers AS (
      SELECT b.id AS id_b,
             max(round(${qcos("a.aq", "b.aq", "a.an2", "b.an2")}, 6)) AS nn_cosine
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND a.id < b.id
      WHERE b.id > (SELECT c FROM cut)
        AND round(${qcos("a.aq", "b.aq", "a.an2", "b.an2")}, 6) >= 0.5
      GROUP BY b.id)
    SELECT s.id AS vec_id, s.centroid_id,
           l.nn_cosine IS NOT NULL AS sem_dup, l.nn_cosine
    FROM assigned s LEFT JOIN losers l ON s.id = l.id_b
    WHERE s.id > (SELECT c FROM cut)
    ORDER BY s.id"""

  /** q119 — URL blocklist: identical host synthesis (with case-variant
    * and trailing-dot forms), the same lowercase + trailing-dot
    * normalization, dot-suffix expansion via list slicing, equi-join
    * against the VALUES blocklist, smallest matching suffix per doc.
    */
  private val q119 = s"""
    WITH docs AS (
      SELECT doc_id,
             concat(CASE WHEN doc_id % 4 = 0 THEN 'sub.' ELSE '' END,
               CASE WHEN doc_id % 5 = 0 THEN 'EXAMPLE' ELSE 'example' END,
               CAST(doc_id % 50 AS VARCHAR), '.com',
               CASE WHEN doc_id % 7 = 0 THEN '.' ELSE '' END) AS host
      FROM documents),
    blocked(domain) AS (
      VALUES ('example7.com'), ('example23.com'), ('sub.example11.com')),
    norm AS (
      SELECT doc_id, host,
             regexp_replace(lower(host), '[.]$$', '') AS nhost
      FROM docs),
    sufs AS (
      SELECT doc_id, host,
             array_to_string(l[len(l) - k + 1 :], '.') AS suffix
      FROM (SELECT doc_id, host, string_split(nhost, '.') AS l,
                   unnest(range(1, len(string_split(nhost, '.')) + 1)) AS k
            FROM norm)),
    hits AS (
      SELECT doc_id, min(s.suffix) AS matched_domain
      FROM sufs s JOIN blocked b ON s.suffix = lower(b.domain)
      GROUP BY doc_id)
    SELECT d.doc_id, d.host,
           h.matched_domain IS NOT NULL AS blocked, h.matched_domain
    FROM docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
    ORDER BY d.doc_id"""

  /** q123 — intra-doc line dedup: q116's synthesis, ordered-distinct
    * reproduced relationally (list_distinct would scramble order),
    * string_agg rebuild per doc. Note: unlike q117, the first EMPTY
    * line also keeps and later empties drop (intra-doc semantics).
    */
  private val q123 = s"""
    WITH body AS (
      SELECT doc_id,
             concat_ws(chr(10),
               substr(coalesce(text, ''), 1, 40),
               substr(coalesce(text, ''), 41, 40),
               substr(coalesce(text, ''), 1, 40),
               substr(coalesce(text, ''), 81, 40),
               CASE WHEN doc_id % 2 = 0 THEN substr(coalesce(text, ''), 41, 40)
                    ELSE substr(coalesce(text, ''), 121, 40) END) AS b
      FROM documents),
    lines AS (
      SELECT doc_id,
             unnest(string_split(b, chr(10))) AS line,
             generate_subscripts(string_split(b, chr(10)), 1) AS pos
      FROM body),
    marked AS (
      SELECT doc_id, line, pos,
             row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) = 1 AS keep
      FROM lines),
    rebuilt AS (
      SELECT doc_id,
             coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '') AS clean
      FROM marked GROUP BY doc_id)
    SELECT doc_id, clean, CAST(length(clean) AS BIGINT) AS n_chars
    FROM rebuilt
    ORDER BY doc_id"""

  /** q124 — char-LM language ID: q115's model-fit algebra per
    * language (shared fixed-point log2 recursion over the union of
    * all counts' values), per-(doc, model) scores, argmax by
    * `(avg desc, lang asc)` — the first-model tie-break of the Spark
    * argmax, since the models pass in alphabetical order.
    */
  private val q124 = s"""
    WITH RECURSIVE lt AS (
      SELECT doc_id, lang, text, lower(text) AS t FROM documents),
    langs(lang) AS (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')),
    curated AS (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY ${h60("concat('cap:', CAST(doc_id AS VARCHAR))")} ASC,
                          doc_id ASC) AS rn
        FROM lt WHERE doc_id % 2 = 0 AND text IS NOT NULL)
      WHERE rn <= 30),
    nt AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE greatest(length(t) - 2, 0) END AS n_tri
      FROM lt),
    tri AS (
      SELECT doc_id,
             ${h60("substr(t, i, 3)")} % 1024 AS b3,
             ${h60("substr(t, i, 2)")} % 1024 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t) - 1)) AS i, t
            FROM lt WHERE length(t) >= 3)),
    big AS (
      SELECT doc_id, ${h60("substr(t, i, 2)")} % 1024 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t))) AS i, t
            FROM lt WHERE length(t) >= 2)),
    ct3 AS (SELECT c.lang, tri.b3 AS b, count(*) AS ct
            FROM tri JOIN curated c USING (doc_id)
            GROUP BY c.lang, tri.b3),
    ct2 AS (SELECT c.lang, big.b2 AS b, count(*) AS ct
            FROM big JOIN curated c USING (doc_id)
            GROUP BY c.lang, big.b2),
    vals AS (
      SELECT DISTINCT v FROM (
        SELECT coalesce(ct3.ct, 0) + 1 AS v
        FROM range(0, 1024) s(b) CROSS JOIN langs
        LEFT JOIN ct3 ON ct3.lang = langs.lang AND ct3.b = s.b
        UNION ALL
        SELECT coalesce(ct2.ct, 0) + 1024 AS v
        FROM range(0, 1024) s(b) CROSS JOIN langs
        LEFT JOIN ct2 ON ct2.lang = langs.lang AND ct2.b = s.b)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    w3 AS (
      SELECT langs.lang, s.b, lg.r AS wv
      FROM range(0, 1024) s(b) CROSS JOIN langs
      LEFT JOIN ct3 ON ct3.lang = langs.lang AND ct3.b = s.b
      JOIN lg ON lg.v = coalesce(ct3.ct, 0) + 1),
    w2 AS (
      SELECT langs.lang, s.b, lg.r AS wv
      FROM range(0, 1024) s(b) CROSS JOIN langs
      LEFT JOIN ct2 ON ct2.lang = langs.lang AND ct2.b = s.b
      JOIN lg ON lg.v = coalesce(ct2.ct, 0) + 1024),
    sc AS (
      SELECT tri.doc_id, w3.lang,
             CAST(sum(w3.wv - w2.wv) AS BIGINT) AS s
      FROM tri
      JOIN w3 ON w3.b = tri.b3
      JOIN w2 ON w2.lang = w3.lang AND w2.b = tri.b2
      GROUP BY tri.doc_id, w3.lang),
    pick AS (
      SELECT sc.doc_id, sc.lang, sc.s // nt.n_tri AS avg,
             row_number() OVER (PARTITION BY sc.doc_id
               ORDER BY sc.s // nt.n_tri DESC, sc.lang ASC) AS r
      FROM sc JOIN nt USING (doc_id) WHERE nt.n_tri > 0)
    SELECT l.doc_id, l.lang, CAST(nt.n_tri AS BIGINT) AS n_tri,
           coalesce(p.lang, 'und') AS lid_pred, p.avg AS lid_avg
    FROM lt l
    JOIN nt USING (doc_id)
    LEFT JOIN (SELECT doc_id, lang, avg FROM pick WHERE r = 1) p
      USING (doc_id)
    ORDER BY l.doc_id"""

  /** q125 — temperature mixture (α = 0.5): q89's machinery with the
    * weight derived from the domain mass itself,
    * `rate = min(1, budget · sqrt(dt) / Σ sqrt(dt) / dt)` — identical
    * left-to-right double arithmetic, IEEE sqrt.
    */
  private val q125 = s"""
    WITH t AS (
      SELECT doc_id, lang, source,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT) AS n_tokens
      FROM documents),
    tot AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS dt,
             CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE) * 1048576.0)) AS BIGINT) AS p
      FROM t GROUP BY source),
    ws AS (SELECT CAST(sum(p) AS BIGINT) AS wsum FROM tot),
    r AS (
      SELECT source,
             least(1.0, 20000.0 * CAST(p AS DOUBLE) / CAST(wsum AS DOUBLE)
                        / CAST(dt AS DOUBLE)) AS rate
      FROM tot CROSS JOIN ws)
    SELECT t.doc_id, t.lang, t.source, t.n_tokens
    FROM t JOIN r ON t.source = r.source
    WHERE CAST(${h60("'tempmix:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
          / 1152921504606846976.0 < r.rate
    ORDER BY t.doc_id"""

  /** The q110 strip chain around an inner expression, composed AFTER
    * nfc_normalize — the per-paragraph hygiene lambda body of q126.
    * Non-interpolated so the regex backslashes stay literal.
    */
  private val hygChain: String = """trim(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(nfc_normalize(p),
        '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
        '(?s)<[^>]+>', ' ', 'g'),
        '&lt;', '<', 'g'),
        '&gt;', '>', 'g'),
        '&quot;', '"', 'g'),
        '&#39;', '''', 'g'),
        '&nbsp;', ' ', 'g'),
        '&amp;', '&', 'g'),
      '\s+', ' ', 'g'))"""

  /** q126 — the full ordered curation composition (CorpusJob.curate):
    * per-paragraph NFC + HTML-strip hygiene, char-LM LID (q124 algebra
    * on the CLEAN text, dim 1024), the CCNet perplexity gate (q115
    * algebra on the LID survivors, dim 4096, threshold form: cut = the
    * lm_avg at the 2n/3 rank, keep >= cut), URL blocklist (q119),
    * Gopher dup-line mass gate (q116), corpus-wide paragraph dedup
    * over the survivors (q117), SemDeDup over the survivors'
    * embeddings (q118 — codebook picked FROM the survivor set),
    * substring-span keep-one-copy excision (q91 on the
    * paragraph-deduped text), and the temperature mixture (q125) over
    * the FINAL token mass. Every stage CTE reads the previous stage's
    * survivor set — the staged composition is the thing under test.
    * Final assembly mirrors the Spark first-failing-stage CASE chain
    * (NULL stage columns for docs that never reached the stage).
    */
  private val q126: String = s"""
    WITH RECURSIVE
    d0 AS (
      SELECT doc_id, lang, source, coalesce(text, '') AS t0 FROM documents),
    syn AS MATERIALIZED (
      SELECT doc_id, lang, source,
             concat_ws(chr(10) || chr(10),
               CASE CAST(doc_id % 3 AS INT)
                 WHEN 0 THEN '<b>subscribe to our newsletter</b>'
                 WHEN 1 THEN 'subscribe   to our newsletter'
                 ELSE 'subscribe to our newsletter' END,
               substr(t0, 1, 60),
               CASE WHEN doc_id % 2 = 0 THEN 'cafe' || chr(769) || ' corner'
                    ELSE 'caf' || chr(233) || ' corner' END,
               CASE WHEN doc_id % 9 = 0 THEN substr(t0, 1, 60)
                    ELSE substr(t0, 61, 60) END,
               CASE WHEN doc_id % 9 = 0 THEN substr(t0, 1, 60)
                    ELSE 'copyright 2026' END) AS body,
             concat(CASE WHEN doc_id % 4 = 0 THEN 'sub.' ELSE '' END,
               'example', CAST(doc_id % 40 AS VARCHAR), '.com') AS host
      FROM d0),
    hyg AS MATERIALIZED (
      SELECT doc_id, lang, source, host,
             array_to_string(
               list_transform(string_split(body, chr(10) || chr(10)),
                 p -> $hygChain),
               chr(10) || chr(10)) AS clean
      FROM syn),
    ltc AS MATERIALIZED (SELECT doc_id, lang, clean, lower(clean) AS t FROM hyg),
    langs(lang) AS (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')),
    curated AS MATERIALIZED (
      SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                 ORDER BY ${h60("concat('cap:', CAST(doc_id AS VARCHAR))")} ASC,
                          doc_id ASC) AS rn
        FROM ltc WHERE doc_id % 2 = 0 AND clean IS NOT NULL)
      WHERE rn <= 30),
    ntL AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN clean IS NULL THEN NULL
                  ELSE greatest(length(t) - 2, 0) END AS n_tri
      FROM ltc),
    triL AS MATERIALIZED (
      SELECT doc_id,
             ${h60("substr(t, i, 3)")} % 1024 AS b3,
             ${h60("substr(t, i, 2)")} % 1024 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t) - 1)) AS i, t
            FROM ltc WHERE length(t) >= 3)),
    bigL AS MATERIALIZED (
      SELECT doc_id, ${h60("substr(t, i, 2)")} % 1024 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t))) AS i, t
            FROM ltc WHERE length(t) >= 2)),
    ct3L AS (SELECT c.lang, triL.b3 AS b, count(*) AS ct
             FROM triL JOIN curated c USING (doc_id)
             GROUP BY c.lang, triL.b3),
    ct2L AS (SELECT c.lang, bigL.b2 AS b, count(*) AS ct
             FROM bigL JOIN curated c USING (doc_id)
             GROUP BY c.lang, bigL.b2),
    valsL AS (
      SELECT DISTINCT v FROM (
        SELECT coalesce(ct3L.ct, 0) + 1 AS v
        FROM range(0, 1024) s(b) CROSS JOIN langs
        LEFT JOIN ct3L ON ct3L.lang = langs.lang AND ct3L.b = s.b
        UNION ALL
        SELECT coalesce(ct2L.ct, 0) + 1024 AS v
        FROM range(0, 1024) s(b) CROSS JOIN langs
        LEFT JOIN ct2L ON ct2L.lang = langs.lang AND ct2L.b = s.b)),
    lg0L AS (SELECT v, length(bin(v)) - 1 AS m FROM valsL),
    lgiL(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0L
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgiL WHERE i < 10)),
    lgL AS MATERIALIZED (SELECT v, r FROM lgiL WHERE i = 10),
    w3L AS MATERIALIZED (
      SELECT langs.lang, s.b, lgL.r AS wv
      FROM range(0, 1024) s(b) CROSS JOIN langs
      LEFT JOIN ct3L ON ct3L.lang = langs.lang AND ct3L.b = s.b
      JOIN lgL ON lgL.v = coalesce(ct3L.ct, 0) + 1),
    w2L AS MATERIALIZED (
      SELECT langs.lang, s.b, lgL.r AS wv
      FROM range(0, 1024) s(b) CROSS JOIN langs
      LEFT JOIN ct2L ON ct2L.lang = langs.lang AND ct2L.b = s.b
      JOIN lgL ON lgL.v = coalesce(ct2L.ct, 0) + 1024),
    scL AS MATERIALIZED (
      SELECT triL.doc_id, w3L.lang,
             CAST(sum(w3L.wv - w2L.wv) AS BIGINT) AS s
      FROM triL
      JOIN w3L ON w3L.b = triL.b3
      JOIN w2L ON w2L.lang = w3L.lang AND w2L.b = triL.b2
      GROUP BY triL.doc_id, w3L.lang),
    pickL AS (
      SELECT scL.doc_id, scL.lang,
             row_number() OVER (PARTITION BY scL.doc_id
               ORDER BY scL.s // ntL.n_tri DESC, scL.lang ASC) AS r
      FROM scL JOIN ntL USING (doc_id) WHERE ntL.n_tri > 0),
    lid AS MATERIALIZED (
      SELECT l.doc_id, coalesce(p.lang, 'und') AS lid_pred
      FROM ltc l
      LEFT JOIN (SELECT doc_id, lang FROM pickL WHERE r = 1) p
        USING (doc_id)),
    s1 AS MATERIALIZED (
      SELECT l.doc_id, l.t, ntL.n_tri
      FROM ltc l JOIN ntL USING (doc_id) JOIN lid USING (doc_id)
      WHERE lid.lid_pred IN ('de', 'en', 'es', 'fr')),
    triP AS MATERIALIZED (
      SELECT doc_id,
             ${h60("substr(t, i, 3)")} % 4096 AS b3,
             ${h60("substr(t, i, 2)")} % 4096 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t) - 1)) AS i, t
            FROM s1 WHERE length(t) >= 3)),
    bigP AS MATERIALIZED (
      SELECT doc_id, ${h60("substr(t, i, 2)")} % 4096 AS b2
      FROM (SELECT doc_id, unnest(range(1, length(t))) AS i, t
            FROM s1 WHERE length(t) >= 2)),
    ct3P AS (SELECT b3 AS b, count(*) AS ct FROM triP
             WHERE doc_id % 10 = 0 GROUP BY b3),
    ct2P AS (SELECT b2 AS b, count(*) AS ct FROM bigP
             WHERE doc_id % 10 = 0 GROUP BY b2),
    valsP AS (
      SELECT DISTINCT v FROM (
        SELECT coalesce(t3.ct, 0) + 1 AS v
        FROM range(0, 4096) s(b) LEFT JOIN ct3P t3 ON t3.b = s.b
        UNION ALL
        SELECT coalesce(t2.ct, 0) + 4096 AS v
        FROM range(0, 4096) s(b) LEFT JOIN ct2P t2 ON t2.b = s.b)),
    lg0P AS (SELECT v, length(bin(v)) - 1 AS m FROM valsP),
    lgiP(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0P
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgiP WHERE i < 10)),
    lgP AS MATERIALIZED (SELECT v, r FROM lgiP WHERE i = 10),
    w3P AS MATERIALIZED (
      SELECT s.b, lgP.r AS wv
      FROM range(0, 4096) s(b)
      LEFT JOIN ct3P ON ct3P.b = s.b
      JOIN lgP ON lgP.v = coalesce(ct3P.ct, 0) + 1),
    w2P AS MATERIALIZED (
      SELECT s.b, lgP.r AS wv
      FROM range(0, 4096) s(b)
      LEFT JOIN ct2P ON ct2P.b = s.b
      JOIN lgP ON lgP.v = coalesce(ct2P.ct, 0) + 4096),
    scP AS MATERIALIZED (
      SELECT triP.doc_id, CAST(sum(w3P.wv - w2P.wv) AS BIGINT) AS s
      FROM triP
      JOIN w3P ON w3P.b = triP.b3
      JOIN w2P ON w2P.b = triP.b2
      GROUP BY triP.doc_id),
    pavg AS MATERIALIZED (
      SELECT s1.doc_id, s1.n_tri,
             CASE WHEN s1.n_tri > 0
                  THEN coalesce(scP.s, 0) // s1.n_tri END AS lm_avg
      FROM s1 LEFT JOIN scP USING (doc_id)),
    prank AS MATERIALIZED (
      SELECT doc_id, lm_avg,
             row_number() OVER (ORDER BY lm_avg DESC, doc_id) AS r
      FROM pavg WHERE n_tri > 0),
    pn AS (SELECT count(*) AS cnt FROM prank),
    pcut AS MATERIALIZED (
      SELECT coalesce(
        (SELECT p.lm_avg FROM prank p, pn WHERE p.r = 2 * pn.cnt // 3),
        -9223372036854775807 - 1) AS cut),
    s2 AS MATERIALIZED (
      SELECT pv.doc_id FROM pavg pv, pcut
      WHERE pv.n_tri > 0 AND pv.lm_avg >= pcut.cut),
    blocked(domain) AS (
      VALUES ('example7.com'), ('example23.com'), ('sub.example11.com')),
    bnorm AS (
      SELECT s2.doc_id,
             regexp_replace(lower(syn.host), '[.]$$', '') AS nhost
      FROM s2 JOIN syn USING (doc_id)),
    bsufs AS (
      SELECT doc_id, array_to_string(l[len(l) - k + 1 :], '.') AS suffix
      FROM (SELECT doc_id, string_split(nhost, '.') AS l,
                   unnest(range(1, len(string_split(nhost, '.')) + 1)) AS k
            FROM bnorm)),
    bhits AS (
      SELECT doc_id, min(s.suffix) AS matched_domain
      FROM bsufs s JOIN blocked b ON s.suffix = lower(b.domain)
      GROUP BY doc_id),
    bmark AS MATERIALIZED (
      SELECT n.doc_id, h.matched_domain IS NOT NULL AS blocked
      FROM bnorm n LEFT JOIN bhits h USING (doc_id)),
    s3 AS MATERIALIZED (SELECT doc_id FROM bmark WHERE NOT blocked),
    rep AS MATERIALIZED (
      SELECT s3.doc_id,
             length(h.clean)
               - (len(string_split(h.clean, chr(10))) - 1) AS line_chars,
             length(h.clean)
               - (len(string_split(h.clean, chr(10))) - 1)
               - length(array_to_string(
                   list_distinct(string_split(h.clean, chr(10))), ''))
               AS dup_chars
      FROM s3 JOIN hyg h USING (doc_id)),
    s4 AS MATERIALIZED (SELECT doc_id FROM rep WHERE NOT (dup_chars * 2 > line_chars)),
    paras AS (
      SELECT h.doc_id,
             unnest(string_split(h.clean, chr(10) || chr(10))) AS para,
             generate_subscripts(string_split(h.clean, chr(10) || chr(10)), 1)
               - 1 AS pos
      FROM hyg h JOIN s4 ON s4.doc_id = h.doc_id),
    marked AS MATERIALIZED (
      SELECT doc_id, para, pos,
             para = '' OR row_number() OVER (PARTITION BY para
               ORDER BY doc_id, pos) = 1 AS keep
      FROM paras),
    pd AS MATERIALIZED (
      SELECT doc_id,
             coalesce(string_agg(para, chr(10) || chr(10) ORDER BY pos)
                        FILTER (WHERE keep), '') AS text_dedup,
             CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
      FROM marked GROUP BY doc_id),
    s5 AS MATERIALIZED (SELECT doc_id FROM pd WHERE trim(text_dedup) != ''),
    ebase AS (
      SELECT vec_id, $quantize AS qe FROM embeddings
      WHERE vec_id IN (SELECT doc_id FROM s5)),
    en2 AS MATERIALIZED (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i]))
               AS BIGINT) AS n2v
      FROM ebase),
    ecents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM en2 ORDER BY h LIMIT 16)),
    easg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC,
                        centroid_id ASC) AS rn
      FROM en2 CROSS JOIN ecents),
    eassigned AS MATERIALIZED (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2
      FROM easg WHERE rn = 1),
    elosers AS MATERIALIZED (
      SELECT b.id AS id_b,
             max(round(${qcos("a.aq", "b.aq", "a.an2", "b.an2")}, 6)) AS nn_cosine
      FROM eassigned a JOIN eassigned b
        ON a.centroid_id = b.centroid_id AND a.id < b.id
      WHERE round(${qcos("a.aq", "b.aq", "a.an2", "b.an2")}, 6) >= 0.35
      GROUP BY b.id),
    sem AS MATERIALIZED (
      SELECT s5.doc_id,
             CASE WHEN ea.id IS NULL THEN NULL
                  ELSE el.nn_cosine IS NOT NULL END AS sem_dup
      FROM s5
      LEFT JOIN eassigned ea ON ea.id = s5.doc_id
      LEFT JOIN elosers el ON el.id_b = s5.doc_id),
    s6 AS MATERIALIZED (SELECT doc_id FROM sem WHERE NOT coalesce(sem_dup, false)),
    st AS MATERIALIZED (
      SELECT s6.doc_id,
             CASE WHEN pd.text_dedup IS NULL OR trim(pd.text_dedup) = ''
                  THEN [] ELSE string_split_regex(trim(pd.text_dedup), '\\s+')
                  END AS tk
      FROM s6 JOIN pd USING (doc_id)),
    ssh AS MATERIALIZED (
      SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             CAST(concat('0x', substr(m, 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id,
               unnest(range(1, len(tk) - 6)) AS pos,
               unnest(list_transform(range(1, len(tk) - 6),
                 i -> md5(array_to_string(
                   list_transform(tk[i:i+7], x -> lower(x)), ' ')))) AS m
        FROM st)),
    sr AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM ssh),
    sp0 AS MATERIALIZED (SELECT doc_id, pos FROM sr WHERE rn >= 2),
    smk AS (
      SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
                  THEN 0 ELSE 1 END AS brk
      FROM sp0),
    sg AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS grp
      FROM smk),
    ssp AS MATERIALIZED (
      SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
      FROM sg GROUP BY doc_id, grp),
    stoks AS MATERIALIZED (
      SELECT doc_id, unnest(range(1, len(tk) + 1)) AS pos, unnest(tk) AS tok
      FROM st),
    skeep AS (
      SELECT tk0.doc_id, tk0.pos, tk0.tok
      FROM stoks tk0
      WHERE NOT EXISTS (SELECT 1 FROM ssp
                        WHERE ssp.doc_id = tk0.doc_id
                          AND tk0.pos BETWEEN ssp.s AND ssp.e)),
    sagg AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
      FROM skeep GROUP BY doc_id),
    ex AS MATERIALIZED (
      SELECT st.doc_id, coalesce(sagg.txt, '') AS text_final
      FROM st LEFT JOIN sagg USING (doc_id)),
    s7 AS MATERIALIZED (
      SELECT doc_id, text_final,
             CAST(len(CASE WHEN trim(text_final) = '' THEN []
                           ELSE string_split_regex(trim(text_final), '\\s+')
                           END) AS BIGINT) AS n_tokens
      FROM ex WHERE trim(text_final) != ''),
    mtot AS (
      SELECT d.source, CAST(sum(s7.n_tokens) AS BIGINT) AS dt,
             CAST(floor(sqrt(CAST(sum(s7.n_tokens) AS DOUBLE) * 1048576.0))
               AS BIGINT) AS p
      FROM s7 JOIN documents d USING (doc_id)
      GROUP BY d.source),
    mws AS (SELECT CAST(sum(p) AS BIGINT) AS wsum FROM mtot),
    mr AS (
      SELECT source,
             least(1.0, 4000.0 * CAST(p AS DOUBLE) / CAST(wsum AS DOUBLE)
                        / CAST(dt AS DOUBLE)) AS rate
      FROM mtot CROSS JOIN mws),
    samp AS MATERIALIZED (
      SELECT s7.doc_id
      FROM s7 JOIN documents d USING (doc_id) JOIN mr ON mr.source = d.source
      WHERE CAST(${h60("'tempmix:' || CAST(s7.doc_id AS VARCHAR)")} AS DOUBLE)
            / 1152921504606846976.0 < mr.rate),
    fin AS (
      SELECT d.doc_id, d.lang, d.source,
             lid.lid_pred,
             pv.lm_avg,
             bm.blocked,
             pd.n_kept,
             sem.sem_dup,
             s7.n_tokens,
             ex.text_final,
             CASE
               WHEN lid.lid_pred NOT IN ('de', 'en', 'es', 'fr') THEN 'lang'
               WHEN NOT (pv.n_tri > 0 AND pv.lm_avg >= pc.cut) THEN 'perplexity'
               WHEN bm.blocked THEN 'blocked_url'
               WHEN rep.dup_chars * 2 > rep.line_chars THEN 'repetitive'
               WHEN trim(pd.text_dedup) = '' THEN 'empty'
               WHEN coalesce(sem.sem_dup, false) THEN 'sem_dup'
               WHEN trim(ex.text_final) = '' THEN 'empty'
               WHEN samp.doc_id IS NULL THEN 'sampled_out'
             END AS drop_reason
      FROM documents d
      CROSS JOIN pcut pc
      LEFT JOIN lid ON lid.doc_id = d.doc_id
      LEFT JOIN pavg pv ON pv.doc_id = d.doc_id
      LEFT JOIN bmark bm ON bm.doc_id = d.doc_id
      LEFT JOIN rep ON rep.doc_id = d.doc_id
      LEFT JOIN pd ON pd.doc_id = d.doc_id
      LEFT JOIN sem ON sem.doc_id = d.doc_id
      LEFT JOIN ex ON ex.doc_id = d.doc_id
      LEFT JOIN s7 ON s7.doc_id = d.doc_id
      LEFT JOIN samp ON samp.doc_id = d.doc_id)
    SELECT doc_id, lang, source, lid_pred, lm_avg, blocked, n_kept,
           sem_dup, n_tokens, text_final, drop_reason,
           drop_reason IS NULL AS kept
    FROM fin
    ORDER BY doc_id"""

  /** q127: GPT-style sequence packing — the one-global-window cumsum
    * over the h60 shuffle order (salt `pack`), then pure block
    * arithmetic at width 2048 (tractable at oracle SF; the operator
    * computes the identical sum distributed — q95's spine).
    */
  private val q127 = s"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT) AS n_tokens,
             ${h60("'pack:' || CAST(doc_id AS VARCHAR)")} AS u
      FROM documents),
    c AS (
      SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (ORDER BY u, doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, lang, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS tok_start,
           CAST((cum - n_tokens) // 2048 AS BIGINT) AS block_first,
           CAST(CASE WHEN n_tokens > 0 THEN (cum - 1) // 2048
                     ELSE (cum - n_tokens) // 2048 END AS BIGINT) AS block_last,
           CAST(CASE WHEN n_tokens > 0
                     THEN (cum - 1) // 2048 - (cum - n_tokens) // 2048 + 1
                     ELSE 0 END AS BIGINT) AS n_blocks
    FROM c ORDER BY doc_id"""

  /** q128: epoched mixture — rate = min(target/dt, maxEpochs=4),
    * floor(rate) guaranteed copies + one more when the h60 draw falls
    * under frac(rate), expanded to 0-based epoch rows.
    */
  private val q128 = s"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(CASE WHEN text IS NULL OR trim(text) = '' THEN []
                           ELSE string_split_regex(trim(text), '\\s+') END) AS BIGINT) AS n_tokens
      FROM documents),
    tot AS (
      SELECT source, CAST(sum(n_tokens) AS BIGINT) AS dt FROM t GROUP BY source),
    r AS (
      SELECT t.doc_id, t.source, t.n_tokens,
             CASE WHEN dt > 0 THEN
               least(CAST(CASE WHEN t.source = 'src1' THEN 10000000
                               WHEN t.source = 'src2' THEN 100000
                               WHEN t.source = 'src3' THEN 20000
                               ELSE 0 END AS DOUBLE) / CAST(dt AS DOUBLE),
                     4.0)
             ELSE 0.0 END AS rate,
             CAST(${h60("'epochmix:' || CAST(doc_id AS VARCHAR)")} AS DOUBLE)
               / 1152921504606846976.0 AS u
      FROM t JOIN tot ON t.source = tot.source),
    n AS (
      SELECT doc_id, source, n_tokens,
             CAST(floor(rate) AS BIGINT) +
               CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END AS n_copies
      FROM r)
    SELECT doc_id, source, n_tokens,
           CAST(unnest(range(n_copies)) AS BIGINT) AS epoch
    FROM n WHERE n_copies > 0
    ORDER BY doc_id, epoch"""

  /** q129: ANN recall@10 — q36's IVF derivation at nProbe = 2, joined
    * against the exact quantized brute-force top-10; micro recall is
    * Σhit/Σexact (integer sums, one division — order-free exact).
    */
  private val q129 = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    qs AS (SELECT vec_id AS query_id, qe AS qq, n2v AS qn2 FROM n2 WHERE vec_id < 10),
    qcell AS (
      SELECT query_id, qq, qn2, centroid_id,
             row_number() OVER (PARTITION BY query_id
               ORDER BY (${qcos("qq", "cq", "qn2", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM qs CROSS JOIN cents),
    probes AS (SELECT query_id, qq, qn2, centroid_id FROM qcell WHERE rn <= 2),
    ivf AS (
      SELECT query_id, id FROM (
        SELECT p.query_id, a.id,
               row_number() OVER (PARTITION BY p.query_id
                 ORDER BY round(${qcos("aq", "qq", "an2", "qn2")}, 6) DESC, a.id ASC) AS rank
        FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
        WHERE a.id <> p.query_id)
      WHERE rank <= 10),
    bf AS (
      SELECT query_id, id FROM (
        SELECT q.query_id, n.vec_id AS id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(${qcos("qe", "qq", "n2v", "qn2")}, 6) DESC, n.vec_id ASC) AS rank
        FROM n2 n CROSS JOIN qs q
        WHERE n.vec_id <> q.query_id)
      WHERE rank <= 10),
    per AS (
      SELECT b.query_id,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(i.id) AS BIGINT) AS n_hit
      FROM bf b LEFT JOIN ivf i ON i.query_id = b.query_id AND i.id = b.id
      GROUP BY b.query_id)
    SELECT query_id, n_exact, n_hit,
           round(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall,
           round(CAST(sum(n_hit) OVER () AS DOUBLE)
                 / CAST(sum(n_exact) OVER () AS DOUBLE), 6) AS micro_recall
    FROM per
    ORDER BY query_id"""

  /** q130: ANALYZE-style column profile over orders — per column:
    * rows, nulls, exact distincts, string-cast min/max. The derived
    * nullable column exercises the null accounting.
    */
  private val q130 = s"""
    WITH o AS (
      SELECT o_custkey, o_orderstatus, o_orderpriority,
             CAST(o_orderdate AS DATE) AS o_orderdate,
             CASE WHEN o_custkey % 10 = 0 THEN NULL
                  ELSE o_orderstatus END AS status_nullable
      FROM orders),
    p AS (
      SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
             count(*) - count(o_custkey) AS n_nulls,
             count(DISTINCT o_custkey) AS n_distinct,
             CAST(min(o_custkey) AS VARCHAR) AS min_value,
             CAST(max(o_custkey) AS VARCHAR) AS max_value FROM o
      UNION ALL
      SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
             count(DISTINCT o_orderstatus),
             CAST(min(o_orderstatus) AS VARCHAR),
             CAST(max(o_orderstatus) AS VARCHAR) FROM o
      UNION ALL
      SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
             count(DISTINCT o_orderpriority),
             CAST(min(o_orderpriority) AS VARCHAR),
             CAST(max(o_orderpriority) AS VARCHAR) FROM o
      UNION ALL
      SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
             count(DISTINCT o_orderdate),
             CAST(min(o_orderdate) AS VARCHAR),
             CAST(max(o_orderdate) AS VARCHAR) FROM o
      UNION ALL
      SELECT 'status_nullable', count(*), count(*) - count(status_nullable),
             count(DISTINCT status_nullable),
             CAST(min(status_nullable) AS VARCHAR),
             CAST(max(status_nullable) AS VARCHAR) FROM o)
    SELECT col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nulls AS BIGINT) AS n_nulls,
           CAST(n_distinct AS BIGINT) AS n_distinct, min_value, max_value
    FROM p ORDER BY col_name"""

  /** q131: the sketch-profile twin — q130's counts/ranges with
    * cardinalities from the portable HLL (p = 8, the q62 register
    * algebra over the long-form (col_name, string-rendered value)).
    */
  private val q131 = {
    val n = graft.operators.HllSketch.rawNumerator(256)
    s"""
    WITH o AS (
      SELECT o_custkey, o_orderstatus, o_orderpriority,
             CAST(o_orderdate AS DATE) AS o_orderdate,
             CASE WHEN o_custkey % 10 = 0 THEN NULL
                  ELSE o_orderstatus END AS status_nullable
      FROM orders),
    lv AS (
      SELECT 'o_custkey' AS col_name, CAST(o_custkey AS VARCHAR) AS v FROM o
      UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM o
      UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM o
      UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM o
      UNION ALL SELECT 'status_nullable', status_nullable FROM o),
    r AS (
      SELECT col_name, CAST(${h60("v")} % 256 AS INTEGER) AS register,
             CAST(max(${graft.operators.HllSketch.duckRho("v", 8)}) AS INTEGER) AS rank
      FROM lv WHERE v IS NOT NULL GROUP BY col_name, register),
    e AS (
      SELECT col_name, CAST(count(*) AS INTEGER) AS hit,
             CAST(sum(CAST(1 AS BIGINT) << (53 - rank)) +
                  (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS fp_sum
      FROM r GROUP BY col_name),
    est AS (
      SELECT col_name,
             CAST(floor(CASE WHEN hit < 256 AND ($n / fp_sum) <= 640.0
                    THEN 256.0 * ln(256.0 / CAST(256 - hit AS DOUBLE))
                    ELSE $n / fp_sum END + 0.5) AS BIGINT) AS n_distinct_est
      FROM e),
    p AS (
      SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
             count(*) - count(o_custkey) AS n_nulls,
             CAST(min(o_custkey) AS VARCHAR) AS min_value,
             CAST(max(o_custkey) AS VARCHAR) AS max_value FROM o
      UNION ALL
      SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
             CAST(min(o_orderstatus) AS VARCHAR),
             CAST(max(o_orderstatus) AS VARCHAR) FROM o
      UNION ALL
      SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
             CAST(min(o_orderpriority) AS VARCHAR),
             CAST(max(o_orderpriority) AS VARCHAR) FROM o
      UNION ALL
      SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
             CAST(min(o_orderdate) AS VARCHAR),
             CAST(max(o_orderdate) AS VARCHAR) FROM o
      UNION ALL
      SELECT 'status_nullable', count(*), count(*) - count(status_nullable),
             CAST(min(status_nullable) AS VARCHAR),
             CAST(max(status_nullable) AS VARCHAR) FROM o)
    SELECT p.col_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nulls AS BIGINT) AS n_nulls, min_value, max_value,
           CAST(coalesce(n_distinct_est, 0) AS BIGINT) AS n_distinct_est
    FROM p LEFT JOIN est ON p.col_name = est.col_name
    ORDER BY p.col_name"""
  }

  /** q132: LSH dedup quality — q22's signature/banding/est CTEs give
    * the LSH pair set at est ≥ 0.35; exact ground truth is the
    * exploded shingle equi-join (Σ df² like the engine, never an
    * all-pairs list_intersect); precision/recall NULL when their
    * denominator is empty.
    */
  private val q132 = s"""
    WITH corpus132 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, substr(text, 1, (length(text) * 3) // 5)
      FROM documents WHERE doc_id % 10 = 0 AND length(text) > 100),
    ${shingleRowsFrom("corpus132")}, $minhashSig,
    lsh AS (SELECT id_a, id_b FROM est WHERE est_jaccard >= 0.55),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id),
    ex AS (
      SELECT inter.id_a, inter.id_b
      FROM inter
      JOIN sz sa ON sa.doc_id = inter.id_a
      JOIN sz sb ON sb.doc_id = inter.id_b
      WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.55),
    hit AS (SELECT ex.id_a, ex.id_b FROM ex
            JOIN lsh ON lsh.id_a = ex.id_a AND lsh.id_b = ex.id_b),
    c AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact,
             (SELECT CAST(count(*) AS BIGINT) FROM lsh) AS n_lsh,
             (SELECT CAST(count(*) AS BIGINT) FROM hit) AS n_hit)
    SELECT n_exact, n_lsh, n_hit,
           CASE WHEN n_lsh > 0
                THEN round(CAST(n_hit AS DOUBLE) / CAST(n_lsh AS DOUBLE), 6) END AS precision,
           CASE WHEN n_exact > 0
                THEN round(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) END AS recall
    FROM c"""

  /** q133: the classifier TRAINING loop replayed in SQL — six unrolled
    * GD iterations (margins = Σ count·weight, quasi-logistic residual
    * `y − (0.5 + x/(2(1+|x|)))` — IEEE-only, no libm exp — quantized
    * to 2^20 fixed-point BEFORE summing, so gradients are exact
    * integers; updates are truncating integer division, which Scala
    * `/`, Spark `div`, and DuckDB `//` all agree on). η = 1/(4n).
    */
  /** The unrolled deterministic-GD training CTE chain (q133/q134):
    * `labeledAll` = every usable doc, `labeled` = the TRAIN split
    * (`trainPred` over labeledAll), `cnt`/`cnta` = per-(doc, bucket)
    * token counts for the train split / all docs, `w<iters>` = the
    * fitted weight table.
    */
  private def gdTraining(iters: Int, trainPred: String): String = {
    val step = (k: Int) => s"""
    m$k AS (
      SELECT l.doc_id, l.y, coalesce(sum(c * wp.w), 0) AS mg
      FROM labeled l
      LEFT JOIN cnt ON cnt.doc_id = l.doc_id
      LEFT JOIN w${k - 1} wp ON wp.bucket = cnt.b
      GROUP BY l.doc_id, l.y),
    g$k AS (
      SELECT doc_id,
             CAST(floor((CAST(y AS DOUBLE) - (0.5 + x / (2.0 * (1.0 + abs(x)))))
                  * 1048576.0 + 0.5) AS BIGINT) AS g
      FROM (SELECT doc_id, y, CAST(mg AS DOUBLE) / 1048576.0 AS x FROM m$k)),
    r$k AS (
      SELECT b, CAST(sum(g * c) AS BIGINT) AS grad
      FROM cnt JOIN g$k USING (doc_id) GROUP BY b),
    w$k AS (
      SELECT wp.bucket, wp.w + coalesce(r$k.grad, 0) // (SELECT den FROM n) AS w
      FROM w${k - 1} wp LEFT JOIN r$k ON r$k.b = wp.bucket)"""
    s"""labeledAll AS (
      SELECT doc_id, text, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
    labeled AS (SELECT * FROM labeledAll WHERE $trainPred),
    toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
      FROM labeledAll),
    cnta AS (
      SELECT doc_id, CAST(${h60("tok")} % 64 AS INTEGER) AS b,
             CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY doc_id, b),
    cnt AS (SELECT cnta.* FROM cnta
            JOIN labeled ON labeled.doc_id = cnta.doc_id),
    n AS (SELECT CAST(4 * count(*) AS BIGINT) AS den FROM labeled),
    w0 AS (SELECT CAST(unnest(range(64)) AS BIGINT) AS bucket,
                  CAST(0 AS BIGINT) AS w),
    ${(1 to iters).map(step).mkString(",")}"""
  }

  private val q133 = s"""
    WITH ${gdTraining(6, "TRUE")}
    SELECT bucket, w FROM w6 ORDER BY bucket"""

  /** q134: held-out evaluation of the q133 trainer — fit on the 3/4
    * train split, score the held-out quarter with the fitted weights
    * (margin ≥ 0 predicts English), emit the confusion matrix +
    * accuracy/precision/recall (NULL on empty denominators).
    */
  private val q134 = s"""
    WITH ${gdTraining(6, "doc_id % 4 <> 3")},
    test AS (SELECT doc_id, y FROM labeledAll WHERE doc_id % 4 = 3),
    tm AS (
      SELECT t.doc_id, t.y, coalesce(sum(c * wp.w), 0) AS mg
      FROM test t
      LEFT JOIN cnta ON cnta.doc_id = t.doc_id
      LEFT JOIN w6 wp ON wp.bucket = cnta.b
      GROUP BY t.doc_id, t.y),
    conf AS (
      SELECT
        CAST(coalesce(sum(CASE WHEN y = 1 AND mg >= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
        CAST(coalesce(sum(CASE WHEN y = 0 AND mg >= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
        CAST(coalesce(sum(CASE WHEN y = 1 AND mg < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn,
        CAST(coalesce(sum(CASE WHEN y = 0 AND mg < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn
      FROM tm)
    SELECT tp, fp, fn, tn,
           CASE WHEN tp + fp + fn + tn > 0
                THEN round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
           END AS accuracy,
           CASE WHEN tp + fp > 0
                THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
           END AS precision,
           CASE WHEN tp + fn > 0
                THEN round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
           END AS recall
    FROM conf"""

  /** q135/q136: BM25 ranked retrieval — the oracle re-derives the whole
    * fixed-point pipeline: the q58 tokenizer, per-doc lengths (zero-token
    * docs keep dl = 0 and count toward N/avgdl), `avgdl_fp = 256·TL // N`,
    * per-query-term document frequencies, the Lucene idf
    * `log2fp(2N+2) − log2fp(2df+1)` via the 10-step recursive-CTE log2
    * (bit-identical to `graft.plans.Log2Fp` — q113's recipe), the
    * integer tf-saturation `22528·tf·af // (10·tf·af + 3·af + 2304·dl)`,
    * and the `(score desc, doc_id)` top-20. q136 runs the same retrieval
    * over the corpus minus the takedown set — the Spark side assembles it
    * from three merged slice indexes plus deleteDocs, so the hash match
    * proves incremental == rebuild.
    */
  /** Common BM25 CTEs (tokenize → tf → lens → meta → Q8 avgdl) plus
    * the log2/idf/weight tail — `qt`/`cand`/`dfq` differ between the
    * flat-query (q135/q136) and batch (q140) forms, so the shared text
    * splits around them.
    */
  private def bm25Base(pred: String): String = s"""toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(coalesce(text, '')), '\\s+')) AS term
      FROM documents WHERE $pred),
    tf AS (
      SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY doc_id, term),
    lens AS (
      SELECT d.doc_id, coalesce(s.dl, 0) AS dl
      FROM (SELECT doc_id FROM documents WHERE $pred) d
      LEFT JOIN (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
                 FROM toks WHERE term <> '' GROUP BY doc_id) s
        ON s.doc_id = d.doc_id),
    meta AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(dl), 0) AS BIGINT) AS tl
      FROM lens),
    av AS (SELECT n, (tl * 256) // greatest(n, 1) AS af FROM meta)"""

  /** The fixed-point log2 (q113's 10-step recursive CTE) over the idf
    * arguments, and the per-term idf — expects `dfq(term, df)`.
    */
  private val bm25Idf = """vals AS (
      SELECT DISTINCT v FROM (
        SELECT 2 * n + 2 AS v FROM meta
        UNION ALL SELECT 2 * df + 1 FROM dfq)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    idf AS (
      SELECT d.term, ln2.r - ld.r AS idf
      FROM dfq d
      CROSS JOIN meta
      JOIN lg ln2 ON ln2.v = 2 * meta.n + 2
      JOIN lg ld ON ld.v = 2 * d.df + 1)"""

  private def bm25Sql(pred: String): String = s"""
    WITH RECURSIVE ${bm25Base(pred)},
    qt AS (SELECT unnest(['dup', 'vector', 'merge', 'zzz']) AS term),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN qt ON qt.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS score_fp FROM w GROUP BY doc_id),
    rk AS (
      SELECT doc_id, score_fp,
             CAST(row_number() OVER (ORDER BY score_fp DESC, doc_id)
               AS INTEGER) AS rank
      FROM sc)
    SELECT doc_id, score_fp, rank FROM rk WHERE rank <= 20 ORDER BY rank"""

  private val q135 = bm25Sql("TRUE")
  private val q136 = bm25Sql("doc_id % 17 <> 3")

  /** q140: batch BM25 — per-(query, doc) scores in one pass, rank
    * partitioned by query. The duplicate/case-variant query term in
    * the Spark-side table collapses before this VALUES list (set
    * semantics).
    */
  private val q140 = s"""
    WITH RECURSIVE ${bm25Base("TRUE")},
    qt(query_id, term) AS (
      VALUES (1, 'dup'), (1, 'line'), (2, 'vector'), (2, 'merge'), (3, 'zzz')),
    terms AS (SELECT DISTINCT term FROM qt),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN terms q ON q.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT q.query_id, c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN qt q ON q.term = c.term
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (
      SELECT query_id, doc_id, CAST(sum(w) AS BIGINT) AS score_fp
      FROM w GROUP BY query_id, doc_id),
    rk AS (
      SELECT query_id, doc_id, score_fp,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY score_fp DESC, doc_id) AS INTEGER) AS rank
      FROM sc)
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score_fp, rank
    FROM rk WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q137/q138 shared CTEs: the typo-companion input, the prefix/suffix
    * block rows (suffix start = max(len−3, 1), the engine-portable
    * form), and per-block sizes. The cap (1000) is applied from ACTUAL
    * counts, so kept/dropped flips with the scale factor exactly as the
    * Spark side does.
    */
  private val fuzzyBase = """
    base AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name FROM customer
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT) + 1000000,
             substr(c_name, 1, 12) || 'x' || substr(c_name, 14)
      FROM customer WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT) + 2000000,
             substr(c_name, 1, 10) || 'x' || substr(c_name, 12, 1) || 'y' ||
             substr(c_name, 14)
      FROM customer WHERE c_custkey % 13 = 0),
    b AS (
      SELECT id, name, length(name) AS len, 'p' AS kind,
             substr(name, 1, 4) AS blk
      FROM base WHERE name IS NOT NULL
      UNION ALL
      SELECT id, name, length(name), 's',
             substr(name, greatest(length(name) - 3, 1), 4)
      FROM base WHERE name IS NOT NULL),
    sz AS (SELECT kind, blk, count(*) AS n FROM b GROUP BY kind, blk)"""

  private val q137 = s"""
    WITH $fuzzyBase,
    kept AS (
      SELECT b.* FROM b
      JOIN sz ON sz.kind = b.kind AND sz.blk = b.blk AND sz.n <= 1000),
    cand AS (
      SELECT DISTINCT a.id AS id_a, c.id AS id_b,
             a.name AS key_a, c.name AS key_b
      FROM kept a
      JOIN kept c ON a.kind = c.kind AND a.blk = c.blk
        AND a.id < c.id AND abs(a.len - c.len) <= 2)
    SELECT id_a, id_b, key_a, key_b,
           CAST(levenshtein(key_a, key_b) AS INTEGER) AS dist
    FROM cand
    WHERE levenshtein(key_a, key_b) <= 2
    ORDER BY id_a, id_b"""

  private val q138 = s"""
    WITH $fuzzyBase
    SELECT kind, blk, CAST(n AS BIGINT) AS n_rows, n <= 1000 AS kept
    FROM sz
    ORDER BY kind, blk"""

  /** q168: the q137 pipeline at the AUTO-derived dial — blockLen =
    * max(2, ceil(bitlen(N)/4)) (log₁₆ N) computed from the record
    * count in SQL, blocking mirrored at that length via the 1-row
    * dial cross join.
    */
  private val q168 = s"""
    WITH base AS (
      SELECT CAST(c_custkey AS BIGINT) AS id, c_name AS name FROM customer
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT) + 1000000,
             substr(c_name, 1, 12) || 'x' || substr(c_name, 14)
      FROM customer WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT) + 2000000,
             substr(c_name, 1, 10) || 'x' || substr(c_name, 12, 1) || 'y' ||
             substr(c_name, 14)
      FROM customer WHERE c_custkey % 13 = 0),
    dial AS (
      SELECT greatest(2, CAST(ceil(length(bin(count(*))) / 4.0) AS INTEGER))
        AS bl
      FROM base WHERE name IS NOT NULL),
    b AS (
      SELECT id, name, length(name) AS len, 'p' AS kind,
             substr(name, 1, d.bl) AS blk
      FROM base, dial d WHERE name IS NOT NULL
      UNION ALL
      SELECT id, name, length(name), 's',
             substr(name, greatest(length(name) - d.bl + 1, 1), d.bl)
      FROM base, dial d WHERE name IS NOT NULL),
    sz AS (SELECT kind, blk, count(*) AS n FROM b GROUP BY kind, blk),
    kept AS (
      SELECT b.* FROM b
      JOIN sz ON sz.kind = b.kind AND sz.blk = b.blk AND sz.n <= 1000),
    cand AS (
      SELECT DISTINCT a.id AS id_a, c.id AS id_b,
             a.name AS key_a, c.name AS key_b
      FROM kept a
      JOIN kept c ON a.kind = c.kind AND a.blk = c.blk
        AND a.id < c.id AND abs(a.len - c.len) <= 2)
    SELECT id_a, id_b, key_a, key_b,
           CAST(levenshtein(key_a, key_b) AS INTEGER) AS dist,
           (SELECT bl FROM dial) AS block_len
    FROM cand
    WHERE levenshtein(key_a, key_b) <= 2
    ORDER BY id_a, id_b"""

  /** q139: fuzzy entity canonicalization — the q137 pair derivation
    * feeding the q55 walk-CTE connected components, then the
    * deterministic canonical election (len desc, id asc; names are
    * fixed-width so min id survives).
    */
  private val q139 = s"""
    WITH RECURSIVE $fuzzyBase,
    kept AS (
      SELECT b.* FROM b
      JOIN sz ON sz.kind = b.kind AND sz.blk = b.blk AND sz.n <= 1000),
    cand AS (
      SELECT DISTINCT a.id AS id_a, c.id AS id_b,
             a.name AS key_a, c.name AS key_b
      FROM kept a
      JOIN kept c ON a.kind = c.kind AND a.blk = c.blk
        AND a.id < c.id AND abs(a.len - c.len) <= 2),
    fp AS (
      SELECT id_a, id_b FROM cand WHERE levenshtein(key_a, key_b) <= 2),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM fp
      UNION
      SELECT id_b, id_a FROM fp),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id),
    cc AS (SELECT id, CAST(min(comp) AS BIGINT) AS comp FROM walk GROUP BY id),
    lab AS (
      SELECT bs.id, bs.name, coalesce(c.comp, bs.id) AS cluster_id,
             length(bs.name) AS len
      FROM base bs LEFT JOIN cc c ON c.id = bs.id)
    SELECT id, name, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
           row_number() OVER (PARTITION BY cluster_id
             ORDER BY len DESC, id ASC) = 1 AS is_canonical
    FROM lab
    ORDER BY id"""

  /** q141: retrieve-then-rerank — the q135 BM25 derivation at rank ≤
    * 100 feeding the q26-family quantized-cosine rerank against doc
    * 0's embedding. Candidates without an embedding drop (inner join,
    * the operator's documented contract — exercised at sf0.1 where
    * embeddings cover 2000 of 5000 docs).
    */
  private val q141 = s"""
    WITH RECURSIVE ${bm25Base("TRUE")},
    qt AS (SELECT unnest(['dup', 'vector', 'merge', 'zzz']) AS term),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN qt ON qt.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS bm25_fp FROM w GROUP BY doc_id),
    rk AS (
      SELECT doc_id, bm25_fp,
             row_number() OVER (ORDER BY bm25_fp DESC, doc_id) AS r
      FROM sc),
    recall AS (SELECT doc_id, bm25_fp FROM rk WHERE r <= 100),
    qv AS (
      SELECT $quantize AS pq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS pn2
      FROM embeddings WHERE vec_id = 0),
    ev AS (
      SELECT vec_id AS doc_id, $quantize AS dq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS dn2
      FROM embeddings),
    scored AS (
      SELECT r.doc_id, r.bm25_fp,
             round(CASE WHEN e.dn2 = 0 OR q.pn2 = 0 THEN 0.0
                        ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                               i -> e.dq[i] * q.pq[i])) AS BIGINT) AS DOUBLE)
                             / (sqrt(CAST(e.dn2 AS DOUBLE)) *
                                sqrt(CAST(q.pn2 AS DOUBLE))) END, 6) AS cosine
      FROM recall r
      JOIN ev e ON e.doc_id = r.doc_id
      CROSS JOIN qv q),
    rr AS (
      SELECT doc_id, bm25_fp, cosine,
             CAST(row_number() OVER (ORDER BY cosine DESC, doc_id)
               AS INTEGER) AS rank
      FROM scored)
    SELECT doc_id, bm25_fp, cosine, rank FROM rr WHERE rank <= 10
    ORDER BY rank"""

  /** q186: reciprocal-rank fusion — the q141 building blocks as two
    * independent top-20 rank lists (full-scoring BM25; quantized cosine
    * vs vec 0 over ALL embeddings, self excluded — the q26 contract),
    * fused by the exact integer quotient `10^6 // (60 + rank)` summed
    * over the lists each doc appears in, ties by id.
    */
  private val q186 = s"""
    WITH RECURSIVE ${bm25Base("TRUE")},
    qt AS (SELECT unnest(['dup', 'vector', 'merge', 'zzz']) AS term),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN qt ON qt.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS bm25_fp FROM w GROUP BY doc_id),
    lex AS (
      SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY bm25_fp DESC, doc_id) AS r
        FROM sc)
      WHERE r <= 20),
    qv AS (
      SELECT $quantize AS pq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS pn2
      FROM embeddings WHERE vec_id = 0),
    ev AS (
      SELECT vec_id AS doc_id, $quantize AS dq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS dn2
      FROM embeddings),
    cosd AS (
      SELECT e.doc_id,
             round(CASE WHEN e.dn2 = 0 OR q.pn2 = 0 THEN 0.0
                        ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                               i -> e.dq[i] * q.pq[i])) AS BIGINT) AS DOUBLE)
                             / (sqrt(CAST(e.dn2 AS DOUBLE)) *
                                sqrt(CAST(q.pn2 AS DOUBLE))) END, 6) AS cosine
      FROM ev e CROSS JOIN qv q
      WHERE e.doc_id <> 0),
    vec AS (
      SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
        FROM cosd)
      WHERE r <= 20),
    u AS (SELECT doc_id, r FROM lex UNION ALL SELECT doc_id, r FROM vec),
    f AS (
      SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lists,
             CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_fp
      FROM u GROUP BY doc_id)
    SELECT doc_id, n_lists, rrf_fp, rank FROM (
      SELECT doc_id, n_lists, rrf_fp,
             CAST(row_number() OVER (ORDER BY rrf_fp DESC, doc_id)
               AS INTEGER) AS rank
      FROM f)
    WHERE rank <= 10
    ORDER BY rank"""

  /** q205/q206 shared chain: q192's whole batch-hybrid derivation as a
    * subquery (DuckDB supports WITH inside a derived table), planted
    * graded qrels, the 10-step Q10 log2 CTE over the needed arguments
    * (ranks/positions + 1 ∈ [2, 11] — Log2Fp's oracle twin), then the
    * trec-style metric arithmetic in exact integers.
    */
  private def retrievalMetricsCtes(q192Sql: String) = s"""
    results AS MATERIALIZED (
      SELECT query_id, doc_id, rank FROM ($q192Sql) __r),
    qrels AS MATERIALIZED (
      SELECT q.query_id, d.doc_id, CAST(d.doc_id % 3 + 1 AS BIGINT) AS grade
      FROM (SELECT unnest([CAST(1 AS BIGINT), CAST(2 AS BIGINT),
                           CAST(3 AS BIGINT)]) AS query_id) q
      JOIN documents d ON (d.doc_id + q.query_id) % 7 = 0),
    lv AS (SELECT unnest(range(2, 12)) AS v),
    lg0 AS (SELECT v, length(bin(CAST(v AS BIGINT))) - 1 AS m FROM lv),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN CAST(v AS BIGINT) << (30 - m)
                  ELSE CAST(v AS BIGINT) >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS MATERIALIZED (SELECT v, r FROM lgi WHERE i = 10),
    hits AS (
      SELECT r.query_id, min(r.rank) AS first_rel_rank,
             CAST(sum(q.grade * 1073741824 // l.r) AS BIGINT) AS dcg_fp
      FROM results r
      JOIN qrels q ON q.query_id = r.query_id AND q.doc_id = r.doc_id
      JOIN lg l ON l.v = r.rank + 1
      WHERE r.rank <= 10
      GROUP BY r.query_id),
    ideal AS (
      SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_judged,
             CAST(sum(CASE WHEN p.pos <= 10
                           THEN p.grade * 1073741824 // l.r
                           ELSE 0 END) AS BIGINT) AS idcg_fp
      FROM (SELECT query_id, doc_id, grade,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY grade DESC, doc_id) AS pos
            FROM qrels) p
      LEFT JOIN lg l ON l.v = p.pos + 1
      GROUP BY p.query_id),
    perq AS (
      SELECT i.query_id, i.n_judged,
             CAST(h.first_rel_rank AS INTEGER) AS first_rel_rank,
             CAST(coalesce(1000000 // h.first_rel_rank, 0) AS BIGINT) AS rr_ppm,
             CAST(CASE WHEN h.first_rel_rank IS NOT NULL THEN 1 ELSE 0 END
               AS INTEGER) AS hit_k,
             CAST(coalesce(h.dcg_fp, 0) AS BIGINT) AS dcg_fp,
             i.idcg_fp,
             CAST(CASE WHEN i.idcg_fp > 0
                       THEN coalesce(h.dcg_fp, 0) * 1000000 // i.idcg_fp
                       ELSE 0 END AS BIGINT) AS ndcg_ppm
      FROM ideal i LEFT JOIN hits h ON h.query_id = i.query_id)"""

  /** q204: the hybrid at the approximate dial — q186's exact fusion
    * (brute vector leg) as ground truth, the q36 IVF derivation probed
    * at nProbe ∈ {1, 2, 4} feeding the same RRF, then the q129 recall
    * protocol over the two top-10 lists per setting. Every output is
    * an exact integer. Multiply-referenced CTEs materialize (the
    * DuckDB inlining rule).
    */
  private val q204 = s"""
    WITH RECURSIVE ${bm25Base("TRUE")},
    qt AS (SELECT unnest(['dup', 'vector', 'merge', 'zzz']) AS term),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN qt ON qt.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (SELECT doc_id, CAST(sum(w) AS BIGINT) AS bm25_fp FROM w GROUP BY doc_id),
    lex AS MATERIALIZED (
      SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY bm25_fp DESC, doc_id) AS r
        FROM sc)
      WHERE r <= 20),
    base AS (SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS MATERIALIZED (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS MATERIALIZED (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    qcell AS MATERIALIZED (
      SELECT vec_id AS query_id, qe AS qq, n2v AS qn2, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM (SELECT vec_id, qe, n2v FROM n2 WHERE vec_id = 0) q CROSS JOIN cents),
    settings(n_probe) AS (VALUES (1), (2), (4)),
    probes AS (
      SELECT s.n_probe, qc.query_id, qc.qq, qc.qn2, qc.centroid_id
      FROM qcell qc CROSS JOIN settings s WHERE qc.rn <= s.n_probe),
    ivfcand AS (
      SELECT p.n_probe, a.id,
             round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
      WHERE a.id <> p.query_id),
    ivfvec AS (
      SELECT n_probe, id AS doc_id, r FROM (
        SELECT n_probe, id,
               row_number() OVER (PARTITION BY n_probe
                 ORDER BY cosine DESC, id) AS r
        FROM ivfcand)
      WHERE r <= 20),
    u AS (
      SELECT s.n_probe, l.doc_id, l.r FROM lex l CROSS JOIN settings s
      UNION ALL SELECT n_probe, doc_id, r FROM ivfvec),
    fused AS MATERIALIZED (
      SELECT n_probe, doc_id FROM (
        SELECT n_probe, doc_id,
               row_number() OVER (PARTITION BY n_probe
                 ORDER BY rrf_fp DESC, doc_id) AS rank
        FROM (SELECT n_probe, doc_id,
                     CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_fp
              FROM u GROUP BY n_probe, doc_id))
      WHERE rank <= 10),
    qrow AS (SELECT qe AS pq, n2v AS pn2 FROM n2 WHERE vec_id = 0),
    cosb AS (
      SELECT c.vec_id AS doc_id,
             round(${qcos("qe", "pq", "n2v", "pn2")}, 6) AS cosine
      FROM n2 c CROSS JOIN qrow WHERE c.vec_id <> 0),
    vecb AS (
      SELECT doc_id, r FROM (
        SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS r
        FROM cosb)
      WHERE r <= 20),
    ub AS (SELECT doc_id, r FROM lex UNION ALL SELECT doc_id, r FROM vecb),
    exact AS MATERIALIZED (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY rrf_fp DESC, doc_id) AS rank
        FROM (SELECT doc_id, CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_fp
              FROM ub GROUP BY doc_id))
      WHERE rank <= 10)
    SELECT CAST(s.n_probe AS INTEGER) AS n_probe,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(count(*) AS BIGINT) AS recall_ppm
    FROM exact e
    CROSS JOIN settings s
    LEFT JOIN fused f ON f.n_probe = s.n_probe AND f.doc_id = e.doc_id
    GROUP BY s.n_probe
    ORDER BY n_probe"""

  /** q212: POPULATION recall telemetry — q204's protocol over q192's
    * whole query set: the per-query lexical legs (q192's BM25 chain),
    * the q36 IVF derivation probed PER QUERY at every setting
    * INCLUDING the exhaustive dial (nProbe = 16 — all cells, so that
    * row IS the exact hybrid, no separate brute leg needed), per-
    * (setting, query) RRF fusion top-10, then the micro recall over
    * the population (integer sums, one division). Multiply-referenced
    * CTEs materialize (the DuckDB inlining rule).
    */
  private val q212 = s"""
    WITH RECURSIVE ${bm25Base("TRUE")},
    qt(query_id, term) AS (
      VALUES (1, 'dup'), (1, 'line'), (2, 'vector'), (2, 'merge'), (3, 'zzz')),
    terms AS (SELECT DISTINCT term FROM qt),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN terms q ON q.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT q.query_id, c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN qt q ON q.term = c.term
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (
      SELECT query_id, doc_id, CAST(sum(w) AS BIGINT) AS score_fp
      FROM w GROUP BY query_id, doc_id),
    lex AS MATERIALIZED (
      SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score_fp DESC, doc_id) AS r
        FROM sc)
      WHERE r <= 20),
    base AS (SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS MATERIALIZED (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS MATERIALIZED (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    qcell AS MATERIALIZED (
      SELECT vec_id AS query_id, qe AS qq, n2v AS qn2, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM (SELECT vec_id, qe, n2v FROM n2 WHERE vec_id IN (1, 2, 3)) q
      CROSS JOIN cents),
    settings(n_probe) AS (VALUES (1), (2), (4), (16)),
    probes AS (
      SELECT s.n_probe, qc.query_id, qc.qq, qc.qn2, qc.centroid_id
      FROM qcell qc CROSS JOIN settings s WHERE qc.rn <= s.n_probe),
    ivfcand AS (
      SELECT p.n_probe, p.query_id, a.id,
             round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
      WHERE a.id <> p.query_id),
    ivfvec AS (
      SELECT n_probe, query_id, id AS doc_id, r FROM (
        SELECT n_probe, query_id, id,
               row_number() OVER (PARTITION BY n_probe, query_id
                 ORDER BY cosine DESC, id) AS r
        FROM ivfcand)
      WHERE r <= 20),
    u AS (
      SELECT s.n_probe, l.query_id, l.doc_id, l.r FROM lex l CROSS JOIN settings s
      UNION ALL SELECT n_probe, query_id, doc_id, r FROM ivfvec),
    fused AS MATERIALIZED (
      SELECT n_probe, query_id, doc_id FROM (
        SELECT n_probe, query_id, doc_id,
               row_number() OVER (PARTITION BY n_probe, query_id
                 ORDER BY rrf_fp DESC, doc_id) AS rank
        FROM (SELECT n_probe, query_id, doc_id,
                     CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_fp
              FROM u GROUP BY n_probe, query_id, doc_id))
      WHERE rank <= 10),
    exact AS MATERIALIZED (
      SELECT query_id, doc_id FROM fused WHERE n_probe = 16)
    SELECT CAST(s.n_probe AS INTEGER) AS n_probe,
           CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN f.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(count(*) AS BIGINT) AS recall_ppm
    FROM exact e
    CROSS JOIN (VALUES (1), (2), (4)) s(n_probe)
    LEFT JOIN fused f ON f.n_probe = s.n_probe
      AND f.query_id = e.query_id AND f.doc_id = e.doc_id
    GROUP BY s.n_probe
    ORDER BY n_probe"""

  /** q214: pure-ANN recall at the dial over the query population —
    * q212's IVF machinery without the lexical/RRF legs: the q36
    * codebook, per-(dial, query) top-10s (the exhaustive dial 16 IS
    * the exact sweep), and the population intersection counts.
    */
  private val q214 = s"""
    WITH base AS (SELECT vec_id, $quantize AS qe FROM embeddings),
    n2 AS MATERIALIZED (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, qe, n2v, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM n2 CROSS JOIN cents),
    assigned AS MATERIALIZED (
      SELECT vec_id AS id, centroid_id, qe AS aq, n2v AS an2 FROM asg WHERE rn = 1),
    qcell AS MATERIALIZED (
      SELECT vec_id AS query_id, qe AS qq, n2v AS qn2, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM (SELECT vec_id, qe, n2v FROM n2 WHERE vec_id IN (1, 2, 3)) q
      CROSS JOIN cents),
    settings(n_probe) AS (VALUES (1), (2), (4), (16)),
    probes AS (
      SELECT s.n_probe, qc.query_id, qc.qq, qc.qn2, qc.centroid_id
      FROM qcell qc CROSS JOIN settings s WHERE qc.rn <= s.n_probe),
    ivfcand AS (
      SELECT p.n_probe, p.query_id, a.id,
             round(${qcos("aq", "qq", "an2", "qn2")}, 6) AS cosine
      FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
      WHERE a.id <> p.query_id),
    ivfvec AS MATERIALIZED (
      SELECT n_probe, query_id, id, r FROM (
        SELECT n_probe, query_id, id,
               row_number() OVER (PARTITION BY n_probe, query_id
                 ORDER BY cosine DESC, id) AS r
        FROM ivfcand)
      WHERE r <= 10),
    exact AS MATERIALIZED (
      SELECT query_id, id FROM ivfvec WHERE n_probe = 16)
    SELECT CAST(s.n_probe AS INTEGER) AS n_probe,
           CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(sum(CASE WHEN f.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN f.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             * 1000000 // CAST(count(*) AS BIGINT) AS recall_ppm
    FROM exact e
    CROSS JOIN (VALUES (1), (2), (4)) s(n_probe)
    LEFT JOIN ivfvec f ON f.n_probe = s.n_probe
      AND f.query_id = e.query_id AND f.id = e.id
    GROUP BY s.n_probe
    ORDER BY n_probe"""

  /** q192: BATCH hybrid fusion — q140's per-query BM25 chain and a
    * per-query quantized-cosine chain (probe vectors 1–3, self
    * excluded), each ranked top-20 PER QUERY, fused by the exact RRF
    * quotient per (query, doc), top-10 per query. Query 3's lexical
    * leg is empty ("zzz") — the mixed-coverage case.
    */
  private val q192 = s"""
    WITH RECURSIVE ${bm25Base("TRUE")},
    qt(query_id, term) AS (
      VALUES (1, 'dup'), (1, 'line'), (2, 'vector'), (2, 'merge'), (3, 'zzz')),
    terms AS (SELECT DISTINCT term FROM qt),
    cand AS (SELECT t.doc_id, t.term, t.tf FROM tf t JOIN terms q ON q.term = t.term),
    dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM cand GROUP BY term),
    $bm25Idf,
    w AS (
      SELECT q.query_id, c.doc_id,
             idf.idf * ((22528 * c.tf * av.af) //
               (10 * c.tf * av.af + 3 * av.af + 2304 * l.dl)) AS w
      FROM cand c
      JOIN qt q ON q.term = c.term
      JOIN idf ON idf.term = c.term
      JOIN lens l ON l.doc_id = c.doc_id
      CROSS JOIN av),
    sc AS (
      SELECT query_id, doc_id, CAST(sum(w) AS BIGINT) AS score_fp
      FROM w GROUP BY query_id, doc_id),
    lex AS (
      SELECT query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score_fp DESC, doc_id) AS r
        FROM sc)
      WHERE r <= 20),
    qv AS (
      SELECT vec_id AS query_id, $quantize AS pq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS pn2
      FROM embeddings WHERE vec_id IN (1, 2, 3)),
    ev AS (
      SELECT vec_id AS doc_id, $quantize AS dq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS dn2
      FROM embeddings),
    cosd AS (
      SELECT q.query_id, e.doc_id,
             round(CASE WHEN e.dn2 = 0 OR q.pn2 = 0 THEN 0.0
                        ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                               i -> e.dq[i] * q.pq[i])) AS BIGINT) AS DOUBLE)
                             / (sqrt(CAST(e.dn2 AS DOUBLE)) *
                                sqrt(CAST(q.pn2 AS DOUBLE))) END, 6) AS cosine
      FROM ev e CROSS JOIN qv q
      WHERE e.doc_id <> q.query_id),
    vec AS (
      SELECT query_id, doc_id, r FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, doc_id) AS r
        FROM cosd)
      WHERE r <= 20),
    u AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, r FROM lex
          UNION ALL SELECT query_id, doc_id, r FROM vec),
    f AS (
      SELECT query_id, doc_id, CAST(count(*) AS INTEGER) AS n_lists,
             CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_fp
      FROM u GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, n_lists, rrf_fp, rank FROM (
      SELECT query_id, doc_id, n_lists, rrf_fp,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY rrf_fp DESC, doc_id) AS INTEGER) AS rank
      FROM f)
    WHERE rank <= 10
    ORDER BY query_id, rank"""

  private val q205 = s"""
    WITH RECURSIVE ${retrievalMetricsCtes(q192)}
    SELECT query_id, n_judged, first_rel_rank, rr_ppm, hit_k,
           dcg_fp, idcg_fp, ndcg_ppm
    FROM perq ORDER BY query_id"""

  /** q213: eval-in-the-loop drift — the q205 chain evaluated TWICE
    * (day 1 = the same hybrid cut to rank ≤ 5, day 2 = the full
    * top-10; the ideal side is shared — judgments don't change), each
    * summarized by the exact q206 means, then the per-metric
    * current/prior/delta rows the ops report emits.
    */
  private val q213 = s"""
    WITH RECURSIVE ${retrievalMetricsCtes(q192)},
    hits5 AS (
      SELECT r.query_id, min(r.rank) AS first_rel_rank,
             CAST(sum(q.grade * 1073741824 // l.r) AS BIGINT) AS dcg_fp
      FROM results r
      JOIN qrels q ON q.query_id = r.query_id AND q.doc_id = r.doc_id
      JOIN lg l ON l.v = r.rank + 1
      WHERE r.rank <= 5
      GROUP BY r.query_id),
    perq5 AS (
      SELECT i.query_id,
             CAST(coalesce(1000000 // h.first_rel_rank, 0) AS BIGINT) AS rr_ppm,
             CAST(CASE WHEN h.first_rel_rank IS NOT NULL THEN 1 ELSE 0 END
               AS INTEGER) AS hit_k,
             CAST(CASE WHEN i.idcg_fp > 0
                       THEN coalesce(h.dcg_fp, 0) * 1000000 // i.idcg_fp
                       ELSE 0 END AS BIGINT) AS ndcg_ppm
      FROM ideal i LEFT JOIN hits5 h ON h.query_id = i.query_id),
    s10 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(CAST(sum(rr_ppm) AS BIGINT) // count(*) AS BIGINT) AS mrr_ppm,
             CAST(CAST(sum(ndcg_ppm) AS BIGINT) // count(*) AS BIGINT) AS mean_ndcg_ppm,
             CAST(CAST(sum(hit_k) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS hit_rate_ppm
      FROM perq),
    s5 AS (
      SELECT CAST(count(*) AS BIGINT) AS n_queries,
             CAST(CAST(sum(rr_ppm) AS BIGINT) // count(*) AS BIGINT) AS mrr_ppm,
             CAST(CAST(sum(ndcg_ppm) AS BIGINT) // count(*) AS BIGINT) AS mean_ndcg_ppm,
             CAST(CAST(sum(hit_k) AS BIGINT) * 1000000 // count(*) AS BIGINT) AS hit_rate_ppm
      FROM perq5)
    SELECT metric, current_ppm, prior_ppm,
           current_ppm - prior_ppm AS delta_ppm
    FROM (
      SELECT 'n_queries' AS metric, s10.n_queries AS current_ppm,
             s5.n_queries AS prior_ppm FROM s10, s5
      UNION ALL SELECT 'mrr_ppm', s10.mrr_ppm, s5.mrr_ppm FROM s10, s5
      UNION ALL SELECT 'mean_ndcg_ppm', s10.mean_ndcg_ppm, s5.mean_ndcg_ppm
        FROM s10, s5
      UNION ALL SELECT 'hit_rate_ppm', s10.hit_rate_ppm, s5.hit_rate_ppm
        FROM s10, s5)
    ORDER BY metric"""

  private val q206 = s"""
    WITH RECURSIVE ${retrievalMetricsCtes(q192)}
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST(CAST(sum(rr_ppm) AS BIGINT) // count(*) AS BIGINT) AS mrr_ppm,
           CAST(CAST(sum(ndcg_ppm) AS BIGINT) // count(*) AS BIGINT)
             AS mean_ndcg_ppm,
           CAST(CAST(sum(hit_k) AS BIGINT) * 1000000 // count(*) AS BIGINT)
             AS hit_rate_ppm
    FROM perq"""

  /** q207: hard-negative mining — the q26 scoring chain for anchors 3
    * and 7 with the planted-positive exclusion and the exact-ppm
    * near-positive band applied BEFORE the top-k cut.
    */
  private val q207 = s"""
    WITH base AS MATERIALIZED (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    q AS (SELECT vec_id AS query_id, qe AS qq FROM base WHERE vec_id IN (3, 7)),
    sc AS (
      SELECT q.query_id, c.vec_id AS id,
             CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i] * q.qq[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i] * c.qe[i])) AS BIGINT) AS n2c,
             CAST(list_sum(list_transform(range(1, 65), i -> q.qq[i] * q.qq[i])) AS BIGINT) AS n2q
      FROM base c JOIN q ON c.vec_id <> q.query_id),
    scored AS (
      SELECT query_id, id,
             round(CASE WHEN n2c = 0 OR n2q = 0 THEN 0.0
                        ELSE CAST(dot AS DOUBLE) /
                             (sqrt(CAST(n2c AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE))) END, 6) AS cosine
      FROM sc),
    banded AS (
      SELECT query_id, id, cosine FROM scored
      WHERE CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) <= 450000
        AND (id + query_id) % 19 <> 0),
    ranked AS (
      SELECT query_id, id, cosine,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY cosine DESC, id ASC) AS INTEGER) AS rank
      FROM banded)
    SELECT query_id, id, cosine, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q208: embedding-space drift — the q36 codebook + assignment
    * derivation run for BOTH snapshots (reference, and the rotated
    * "new crawl"), cell masses full-outer joined, then q148's exact
    * smoothed-PSI term arithmetic per cell. Rotation commutes with the
    * elementwise quantization, so the rotated snapshot derives from
    * the already-quantized lists.
    */
  private val q208 = s"""
    WITH RECURSIVE base AS MATERIALIZED (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    refn AS MATERIALIZED (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    cents AS MATERIALIZED (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM refn ORDER BY h LIMIT 16)),
    curn AS (
      SELECT vec_id,
             CASE WHEN vec_id % 2 = 0 THEN list_concat(qe[9:64], qe[1:8])
                  ELSE qe END AS qe
      FROM base),
    curn2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM curn),
    asgr AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM refn CROSS JOIN cents),
    refc AS (
      SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_ref
      FROM asgr WHERE rn = 1 GROUP BY centroid_id),
    asgc AS (
      SELECT vec_id, centroid_id,
             row_number() OVER (PARTITION BY vec_id
               ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC, centroid_id ASC) AS rn
      FROM curn2 CROSS JOIN cents),
    curc AS (
      SELECT centroid_id, CAST(count(*) AS BIGINT) AS n_cur
      FROM asgc WHERE rn = 1 GROUP BY centroid_id),
    cnt AS MATERIALIZED (
      SELECT CAST(coalesce(r.centroid_id, c.centroid_id) AS VARCHAR) AS category,
             coalesce(r.n_ref, 0) AS n_ref, coalesce(c.n_cur, 0) AS n_cur
      FROM refc r FULL OUTER JOIN curc c ON c.centroid_id = r.centroid_id),
    tot AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS tr0, CAST(sum(n_cur) AS BIGINT) AS tc0,
             CAST(count(*) AS BIGINT) AS cats
      FROM cnt),
    sm AS MATERIALIZED (
      SELECT c.category, c.n_ref, c.n_cur,
             (c.n_ref + 1) * (t.tc0 + t.cats) AS a,
             (c.n_cur + 1) * (t.tr0 + t.cats) AS b
      FROM cnt c CROSS JOIN tot t),
    vals AS (SELECT DISTINCT v FROM (
      SELECT a AS v FROM sm UNION ALL SELECT b FROM sm)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS MATERIALIZED (SELECT v, r FROM lgi WHERE i = 10)
    SELECT s.category, s.n_ref, s.n_cur,
           CAST(CAST(CAST(s.a - s.b AS HUGEINT) * (la.r - lb.r)
                AS DECIMAL(38,0)) AS VARCHAR) AS psi_term_fp
    FROM sm s JOIN lg la ON la.v = s.a JOIN lg lb ON lb.v = s.b
    ORDER BY s.category"""

  /** q209: n-gram diversity — the family tokenizer, every n-gram
    * occurrence (repeats included) for n ∈ {1, 2, 3}, exact counts and
    * ppm ratios.
    */
  private val q209 = s"""
    WITH toks AS (${lowerToksFrom("documents")}),
    g AS (
      SELECT ns.n,
             unnest(CASE WHEN len(tk) < ns.n THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(range(1, len(tk) - ns.n + 2),
                           i -> array_to_string(tk[i:i+ns.n-1], ' ')) END) AS ngram
      FROM toks CROSS JOIN (SELECT unnest([1, 2, 3]) AS n) ns),
    c AS (
      SELECT n, CAST(count(*) AS BIGINT) AS total_ngrams,
             CAST(count(DISTINCT ngram) AS BIGINT) AS distinct_ngrams
      FROM g GROUP BY n)
    SELECT CAST(n AS INTEGER) AS n, total_ngrams, distinct_ngrams,
           CAST(CASE WHEN total_ngrams > 0
                     THEN distinct_ngrams * 1000000 // total_ngrams
                     ELSE 0 END AS BIGINT) AS distinct_ppm
    FROM c ORDER BY n"""

  /** q193: semantic decontamination — per corpus vector the best
    * benchmark match by exact quantized cosine (benchmark = every 50th
    * vector verbatim under an offset id), ties to the lower benchmark
    * id, flagged at 0.9. Mirrors `Decontaminate.semanticOverlap` =
    * the bruteForceTopKQuantized arithmetic at k = 1.
    */
  private val q193 = s"""
    WITH c AS (
      SELECT vec_id AS doc_id, $quantize AS cq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS cn2
      FROM embeddings),
    b AS (
      SELECT vec_id + 1000000 AS bench_id, $quantize AS bq,
             CAST(list_sum(list_transform($quantize, x -> x * x)) AS BIGINT) AS bn2
      FROM embeddings WHERE vec_id % 50 = 0),
    s AS (
      SELECT c.doc_id, b.bench_id,
             round(CASE WHEN c.cn2 = 0 OR b.bn2 = 0 THEN 0.0
                        ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                               i -> c.cq[i] * b.bq[i])) AS BIGINT) AS DOUBLE)
                             / (sqrt(CAST(c.cn2 AS DOUBLE)) *
                                sqrt(CAST(b.bn2 AS DOUBLE))) END, 6) AS cosine
      FROM c CROSS JOIN b
      WHERE b.bench_id <> c.doc_id)
    SELECT doc_id, bench_id, cosine, cosine >= 0.9 AS contaminated FROM (
      SELECT doc_id, bench_id, cosine,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY cosine DESC, bench_id) AS rn
      FROM s)
    WHERE rn = 1
    ORDER BY doc_id"""

  // ---- portable Bloom filter (q194–q197) ---------------------------------

  /** The Bloom hash rows as a VALUES list — constants derived by
    * [[graft.operators.PortableBloom.bloomA]]/`bloomB` (same
    * literal-string derivation the Spark plan uses, the q63 CountMin
    * discipline).
    */
  private def bloomPerms(k: Int): String =
    (0 until k).map(i =>
      s"($i, ${graft.operators.PortableBloom.bloomA(i)}, ${graft.operators.PortableBloom.bloomB(i)})")
      .mkString(", ")

  /** Bit position of one hash row for a pre-reduced 30-bit hash column:
    * `((pa·h30 + pb) mod P) mod m` (m = 16384, the default geometry).
    */
  private def bloomPos(h30: String): String =
    s"((pm.pa * ($h30) + pm.pb) % 2147483647) % 16384"

  /** Word/mask of a position — 32-bit words in BIGINT, the
    * PortableBloom layout. */
  private def bloomWord(pos: String): String = s"CAST(($pos) // 32 AS INTEGER)"
  private def bloomMask(pos: String): String =
    s"(CAST(1 AS BIGINT) << CAST(($pos) % 32 AS INTEGER))"

  /** q194: the per-flag Bloom filter over l_partkey rebuilt bit-for-bit
    * — word rows are `bit_or` of single-bit masks, so the gate hash
    * covers the filter itself, not a summary.
    */
  private val q194 = s"""
    WITH perm(i, pa, pb) AS (VALUES ${bloomPerms(4)}),
    h AS (
      SELECT l_returnflag, ${h60("CAST(l_partkey AS VARCHAR)")} % 1073741824 AS h30
      FROM lineitem WHERE l_partkey IS NOT NULL),
    p AS (
      SELECT l_returnflag, ${bloomPos("h.h30")} AS pos
      FROM h CROSS JOIN perm pm)
    SELECT l_returnflag, ${bloomWord("pos")} AS word,
           bit_or(${bloomMask("pos")}) AS bits
    FROM p
    GROUP BY l_returnflag, word
    ORDER BY l_returnflag, word"""

  /** q195: the Bloom rollup proof — the oracle builds the per-flag
    * filter in ONE shot (the Spark side merges monthly filters; OR
    * associativity + idempotence make them the same bits) and probes
    * the same supplier ∪ offset-non-member universe.
    */
  private val q195 = s"""
    WITH perm(i, pa, pb) AS (VALUES ${bloomPerms(4)}),
    li AS (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem),
    bloom AS (
      SELECT l_returnflag, ${bloomWord("pos")} AS word,
             bit_or(${bloomMask("pos")}) AS bits
      FROM (
        SELECT l_returnflag,
               ${bloomPos(s"${h60("CAST(l_suppkey AS VARCHAR)")} % 1073741824")} AS pos
        FROM li CROSS JOIN perm pm)
      GROUP BY l_returnflag, word),
    uni AS (
      SELECT s_suppkey AS key FROM supplier
      UNION ALL SELECT s_suppkey + 1000000 FROM supplier),
    pk AS (
      SELECT f.l_returnflag, u.key
      FROM (SELECT DISTINCT l_returnflag FROM lineitem) f CROSS JOIN uni u),
    pp AS (
      SELECT l_returnflag, key,
             ${bloomPos(s"${h60("CAST(key AS VARCHAR)")} % 1073741824")} AS pos
      FROM pk CROSS JOIN perm pm),
    probe AS (
      SELECT pp.l_returnflag, pp.key,
             min(CASE WHEN (coalesce(b.bits, 0) & ${bloomMask("pp.pos")}) <> 0
                      THEN 1 ELSE 0 END) AS member
      FROM pp LEFT JOIN bloom b
        ON b.l_returnflag = pp.l_returnflag AND b.word = ${bloomWord("pp.pos")}
      GROUP BY pp.l_returnflag, pp.key),
    ex AS (SELECT l_returnflag, l_suppkey AS key, 1 AS exq FROM li)
    SELECT p.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(coalesce(e.exq, 0)) AS BIGINT) AS n_members,
           CAST(sum(p.member) AS BIGINT) AS n_bloom_hits,
           CAST(sum(CASE WHEN p.member = 1 AND e.exq IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN p.member = 0 AND e.exq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
    FROM probe p LEFT JOIN ex e
      ON p.l_returnflag = e.l_returnflag AND p.key = e.key
    GROUP BY p.l_returnflag
    ORDER BY p.l_returnflag"""

  /** q196: Bloom decontamination — the benchmark shingle filter rebuilt
    * bit-for-bit, every corpus shingle probed against it, beside the
    * exact q68-style overlap; the drop verdict thresholds the Bloom
    * ratio at 1/4.
    */
  private val q196 = s"""
    WITH $shingleRows,
    perm(i, pa, pb) AS (VALUES ${bloomPerms(4)}),
    b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 50 = 0),
    bloom AS (
      SELECT ${bloomWord("pos")} AS word, bit_or(${bloomMask("pos")}) AS bits
      FROM (
        SELECT ${bloomPos(s"${h60("b.shingle")} % 1073741824")} AS pos
        FROM b CROSS JOIN perm pm)
      GROUP BY word),
    c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 50 <> 0),
    cp AS (
      SELECT c.doc_id, c.shingle,
             ${bloomPos(s"${h60("c.shingle")} % 1073741824")} AS pos
      FROM c CROSS JOIN perm pm),
    hit AS (
      SELECT cp.doc_id, cp.shingle,
             min(CASE WHEN (coalesce(bl.bits, 0) & ${bloomMask("cp.pos")}) <> 0
                      THEN 1 ELSE 0 END) AS hit
      FROM cp LEFT JOIN bloom bl ON bl.word = ${bloomWord("cp.pos")}
      GROUP BY cp.doc_id, cp.shingle),
    ex AS (
      SELECT c.doc_id, c.shingle,
             CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END AS exq
      FROM c LEFT JOIN b ON c.shingle = b.shingle)
    SELECT h.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(h.hit) AS BIGINT) AS n_bloom_hits,
           CAST(sum(e.exq) AS BIGINT) AS n_exact_hits,
           CAST(CASE WHEN sum(h.hit) * 4 >= count(*) THEN 1 ELSE 0 END AS INTEGER) AS drop_doc
    FROM hit h JOIN ex e ON h.doc_id = e.doc_id AND h.shingle = e.shingle
    GROUP BY h.doc_id
    ORDER BY h.doc_id"""

  /** q197: novelty from maintained Bloom state — the oracle builds the
    * reference filter in ONE shot; the Spark side folds it as two
    * appended day-halves and reads merged, so the hash proves
    * union-of-appends == one-shot through the driver.
    */
  private val q197 = s"""
    WITH $shingleRows,
    perm(i, pa, pb) AS (VALUES ${bloomPerms(4)}),
    b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 3 <> 0),
    bloom AS (
      SELECT ${bloomWord("pos")} AS word, bit_or(${bloomMask("pos")}) AS bits
      FROM (
        SELECT ${bloomPos(s"${h60("b.shingle")} % 1073741824")} AS pos
        FROM b CROSS JOIN perm pm)
      GROUP BY word),
    c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 3 = 0),
    cp AS (
      SELECT c.doc_id, c.shingle,
             ${bloomPos(s"${h60("c.shingle")} % 1073741824")} AS pos
      FROM c CROSS JOIN perm pm),
    hit AS (
      SELECT cp.doc_id, cp.shingle,
             min(CASE WHEN (coalesce(bl.bits, 0) & ${bloomMask("cp.pos")}) <> 0
                      THEN 1 ELSE 0 END) AS hit
      FROM cp LEFT JOIN bloom bl ON bl.word = ${bloomWord("cp.pos")}
      GROUP BY cp.doc_id, cp.shingle)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(hit) AS BIGINT) AS n_bloom_hits,
           CAST((count(*) - sum(hit)) * 1000000 // count(*) AS BIGINT) AS novelty_ppm
    FROM hit
    GROUP BY doc_id
    ORDER BY doc_id"""

  /** q198: MMR diversified top-k — the 24-candidate exact-cosine cut
    * (q26's chain at one query), candidate pairwise sims in integer
    * ppm, then ALL EIGHT greedy steps unrolled as CTEs (each step:
    * max-sim of every remaining candidate to the accumulated picks,
    * the exact `λ·rel − (1−λ)·msim` objective, argmax with ties to the
    * lower id — the PageRank/DoReMi unroll discipline).
    */
  private val q198 = {
    val lam = 700000L
    val oneMinus = 1000000L - lam
    val steps = (2 to 8).map { r =>
      s"""
    sc$r AS (
      SELECT c.id, c.rel_ppm, max(p.sim_ppm) AS msim
      FROM cand c JOIN pair p
        ON p.ia = c.id AND p.ib IN (SELECT id FROM acc${r - 1})
      WHERE c.id NOT IN (SELECT id FROM acc${r - 1})
      GROUP BY c.id, c.rel_ppm),
    sel$r AS (
      SELECT id, rel_ppm, msim AS msim_ppm,
             $lam * rel_ppm - $oneMinus * msim AS score_fp,
             CAST($r AS INTEGER) AS mmr_rank
      FROM sc$r ORDER BY score_fp DESC, id LIMIT 1),
    acc$r AS MATERIALIZED (SELECT * FROM acc${r - 1} UNION ALL SELECT id, rel_ppm, msim_ppm, score_fp, mmr_rank FROM sel$r)"""
    }.mkString(",")
    s"""
    WITH base AS MATERIALIZED (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    q AS (SELECT vec_id AS query_id, qe AS qq FROM base WHERE vec_id = 7),
    sc AS (
      SELECT c.vec_id AS id,
             CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i] * q.qq[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i] * c.qe[i])) AS BIGINT) AS n2c,
             CAST(list_sum(list_transform(range(1, 65), i -> q.qq[i] * q.qq[i])) AS BIGINT) AS n2q
      FROM base c JOIN q ON c.vec_id <> q.query_id),
    scored AS (
      SELECT id,
             round(CASE WHEN n2c = 0 OR n2q = 0 THEN 0.0
                        ELSE CAST(dot AS DOUBLE) /
                             (sqrt(CAST(n2c AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE))) END, 6) AS cosine
      FROM sc),
    cand0 AS (
      SELECT id, cosine, row_number() OVER (ORDER BY cosine DESC, id) AS rn
      FROM scored),
    cand AS MATERIALIZED (
      SELECT id, CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS rel_ppm
      FROM cand0 WHERE rn <= 24),
    cq AS (
      SELECT b.vec_id AS id, b.qe,
             CAST(list_sum(list_transform(range(1, 65), i -> b.qe[i] * b.qe[i])) AS BIGINT) AS n2
      FROM base b JOIN cand ON b.vec_id = cand.id),
    pair AS MATERIALIZED (
      SELECT a.id AS ia, b.id AS ib,
             CAST(floor(round(CASE WHEN a.n2 = 0 OR b.n2 = 0 THEN 0.0
               ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                      i -> a.qe[i] * b.qe[i])) AS BIGINT) AS DOUBLE)
                    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) END, 6)
               * 1000000 + 0.5) AS BIGINT) AS sim_ppm
      FROM cq a JOIN cq b ON a.id <> b.id),
    sel1 AS (
      SELECT id, rel_ppm, CAST(0 AS BIGINT) AS msim_ppm,
             $lam * rel_ppm AS score_fp, CAST(1 AS INTEGER) AS mmr_rank
      FROM cand ORDER BY rel_ppm DESC, id LIMIT 1),
    acc1 AS MATERIALIZED (SELECT * FROM sel1),${steps}
    SELECT mmr_rank, id, rel_ppm, msim_ppm, score_fp
    FROM acc8
    ORDER BY mmr_rank"""
  }

  /** q199: BATCH MMR — q198's greedy unrolled PER QUERY: candidate cut
    * and pairwise sims carry query_id, each round's argmax is a
    * `row_number() PARTITION BY query_id` pick, and the exclusion of
    * already-picked candidates is a correlated NOT EXISTS against the
    * accumulated set.
    */
  private val q199 = {
    val lam = 700000L
    val oneMinus = 1000000L - lam
    val steps = (2 to 5).map { r =>
      s"""
    sc$r AS (
      SELECT c.query_id, c.id, c.rel_ppm, max(p.sim_ppm) AS msim
      FROM cand c
      JOIN pair p ON p.query_id = c.query_id AND p.ia = c.id
      JOIN acc${r - 1} s ON s.query_id = p.query_id AND s.id = p.ib
      WHERE NOT EXISTS (SELECT 1 FROM acc${r - 1} x
                        WHERE x.query_id = c.query_id AND x.id = c.id)
      GROUP BY c.query_id, c.id, c.rel_ppm),
    sel$r AS (
      SELECT query_id, id, rel_ppm, msim AS msim_ppm, score_fp,
             CAST($r AS INTEGER) AS mmr_rank
      FROM (
        SELECT query_id, id, rel_ppm, msim,
               $lam * rel_ppm - $oneMinus * msim AS score_fp,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY ($lam * rel_ppm - $oneMinus * msim) DESC, id) AS rn
        FROM sc$r)
      WHERE rn = 1),
    acc$r AS MATERIALIZED (
      SELECT * FROM acc${r - 1}
      UNION ALL
      SELECT query_id, id, rel_ppm, msim_ppm, score_fp, mmr_rank FROM sel$r)"""
    }.mkString(",")
    s"""
    WITH base AS MATERIALIZED (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    q AS (SELECT vec_id AS query_id, qe AS qq FROM base WHERE vec_id IN (3, 5, 9)),
    sc AS (
      SELECT q.query_id, c.vec_id AS id,
             CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i] * q.qq[i])) AS BIGINT) AS dot,
             CAST(list_sum(list_transform(range(1, 65), i -> c.qe[i] * c.qe[i])) AS BIGINT) AS n2c,
             CAST(list_sum(list_transform(range(1, 65), i -> q.qq[i] * q.qq[i])) AS BIGINT) AS n2q
      FROM base c JOIN q ON c.vec_id <> q.query_id),
    scored AS (
      SELECT query_id, id,
             round(CASE WHEN n2c = 0 OR n2q = 0 THEN 0.0
                        ELSE CAST(dot AS DOUBLE) /
                             (sqrt(CAST(n2c AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE))) END, 6) AS cosine
      FROM sc),
    cand0 AS (
      SELECT query_id, id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, id) AS rn
      FROM scored),
    cand AS MATERIALIZED (
      SELECT query_id, id, CAST(floor(cosine * 1000000 + 0.5) AS BIGINT) AS rel_ppm
      FROM cand0 WHERE rn <= 16),
    cq AS (
      SELECT b.vec_id AS id, b.qe,
             CAST(list_sum(list_transform(range(1, 65), i -> b.qe[i] * b.qe[i])) AS BIGINT) AS n2
      FROM base b JOIN (SELECT DISTINCT id FROM cand) ci ON b.vec_id = ci.id),
    pair AS MATERIALIZED (
      SELECT x.query_id, x.id AS ia, y.id AS ib,
             CAST(floor(round(CASE WHEN a.n2 = 0 OR b.n2 = 0 THEN 0.0
               ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                      i -> a.qe[i] * b.qe[i])) AS BIGINT) AS DOUBLE)
                    / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) END, 6)
               * 1000000 + 0.5) AS BIGINT) AS sim_ppm
      FROM cand x
      JOIN cand y ON x.query_id = y.query_id AND x.id <> y.id
      JOIN cq a ON a.id = x.id
      JOIN cq b ON b.id = y.id),
    sel1 AS (
      SELECT query_id, id, rel_ppm, CAST(0 AS BIGINT) AS msim_ppm,
             $lam * rel_ppm AS score_fp, CAST(1 AS INTEGER) AS mmr_rank
      FROM (
        SELECT query_id, id, rel_ppm,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel_ppm DESC, id) AS rn
        FROM cand)
      WHERE rn = 1),
    acc1 AS MATERIALIZED (SELECT * FROM sel1),${steps}
    SELECT query_id, mmr_rank, id, rel_ppm, msim_ppm, score_fp
    FROM acc5
    ORDER BY query_id, mmr_rank"""
  }

  /** Shared JL-projection CTE fragment (q200/q201): the ±1 sign matrix
    * from `h60("rp:j:d")` parity (no plane literals — every sign is
    * re-derived), projected coordinates as exact integer sums over the
    * shared quantized vectors.
    */
  private def rpProjected(outDim: Int) = s"""
    base AS MATERIALIZED (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    sgn AS MATERIALIZED (
      SELECT j, d,
             CASE WHEN ${h60("'rp:' || j || ':' || d")} % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM range($outDim) a(j) CROSS JOIN range(64) b(d)),
    yv AS MATERIALIZED (
      SELECT e.vec_id, g.j,
             CAST(sum(g.s * e.qe[CAST(g.d AS INTEGER) + 1]) AS BIGINT) AS yj
      FROM base e CROSS JOIN sgn g
      GROUP BY e.vec_id, g.j)"""

  /** q200: per-vector projection fingerprints — sum / L1 / min / max
    * of the 16 projected integer coordinates.
    */
  private val q200 = s"""
    WITH ${rpProjected(16)}
    SELECT vec_id,
           CAST(sum(yj) AS BIGINT) AS rp_sum,
           CAST(sum(abs(yj)) AS BIGINT) AS rp_l1,
           CAST(min(yj) AS BIGINT) AS rp_min,
           CAST(max(yj) AS BIGINT) AS rp_max
    FROM yv
    GROUP BY vec_id
    ORDER BY vec_id"""

  /** q201: project-then-rescore ANN — the div-64 projected
    * squared-distance shortlist (80/query, ties to the lower id), then
    * the exact full-dimension quantized-cosine top-10 over ONLY the
    * shortlist (q26's arithmetic and tie-break).
    */
  private val q201 = s"""
    WITH ${rpProjected(32)},
    yq AS (SELECT vec_id AS query_id, j, yj FROM yv WHERE vec_id < 5),
    dist AS (
      SELECT q.query_id, c.vec_id AS id,
             CAST(sum((q.yj - c.yj) * (q.yj - c.yj)) AS BIGINT) // 64 AS d64
      FROM yq q JOIN yv c ON c.vec_id <> q.query_id AND q.j = c.j
      GROUP BY q.query_id, c.vec_id),
    short AS (
      SELECT query_id, id FROM (
        SELECT query_id, id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d64 ASC, id ASC) AS rn
        FROM dist)
      WHERE rn <= 80),
    bn AS MATERIALIZED (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2
      FROM base),
    resc AS (
      SELECT s.query_id, s.id,
             round(CASE WHEN c.n2 = 0 OR q2.n2 = 0 THEN 0.0
                   ELSE CAST(CAST(list_sum(list_transform(range(1, 65),
                          i -> c.qe[i] * q2.qe[i])) AS BIGINT) AS DOUBLE)
                        / (sqrt(CAST(c.n2 AS DOUBLE)) * sqrt(CAST(q2.n2 AS DOUBLE))) END, 6) AS cosine
      FROM short s
      JOIN bn c ON c.vec_id = s.id
      JOIN bn q2 ON q2.vec_id = s.query_id)
    SELECT query_id, id, cosine, CAST(rank AS INTEGER) AS rank FROM (
      SELECT query_id, id, cosine,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, id) AS rank
      FROM resc)
    WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q143: exact-phrase match — positional tokens (filtered like the
    * Spark side, so indexes align), consecutive-pair predicate,
    * overlap-counted per doc.
    */
  private val q143 = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    i AS (
      SELECT doc_id, unnest(range(1, len(tk))) AS i, tk
      FROM t WHERE len(tk) >= 2)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS hits
    FROM i
    WHERE tk[i] = 'order' AND tk[i + 1] = 'order'
    GROUP BY doc_id
    ORDER BY doc_id"""

  /** Shared PQ derivation (q144–q146): the (m=8, k=16) product
    * codebook from the 16 smallest-`h60('pq:'||id)` vectors (code =
    * position in hash order, the `IvfIndex.centroids` pick), then per
    * (vector, subspace) the argmin EXACT integer squared distance to
    * the 16 sub-centroids, ties to the lower code — mirror of
    * `graft.plans.PqEncode` (which minimizes `n2c − 2·dot`, equal to
    * d2 minus the per-sub constant `n2v`, so the argmin and its ties
    * coincide).
    */
  private val pqPrefix = s"""
    WITH base AS (
      SELECT vec_id, $quantize AS qe FROM embeddings),
    samp AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS code, qe
      FROM (SELECT vec_id, qe,
                   ${h60("'pq:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM base ORDER BY h LIMIT 16)),
    cents AS (
      SELECT s.sub, p.code,
             list_transform(range(1, 9), i -> p.qe[s.sub * 8 + i]) AS cv
      FROM samp p CROSS JOIN (SELECT CAST(unnest(range(0, 8)) AS INTEGER) AS sub) s),
    dists AS (
      SELECT b.vec_id, c.sub, c.code,
             CAST(list_sum(list_transform(range(1, 9), i ->
               (b.qe[c.sub * 8 + i] - c.cv[i]) * (b.qe[c.sub * 8 + i] - c.cv[i])))
               AS BIGINT) AS d2
      FROM base b CROSS JOIN cents c),
    codes AS (
      SELECT vec_id, sub, code, d2 FROM (
        SELECT vec_id, sub, code, d2,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d2 ASC, code ASC) AS rn
        FROM dists)
      WHERE rn = 1)"""

  /** q144: PQ encoding — per vector the 8 sub-codes (hash-checked as a
    * joined string) and the exact integer reconstruction error Σ d2.
    */
  private val q144 = s"""
    $pqPrefix
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), '-' ORDER BY sub) AS pq_codes,
           CAST(sum(d2) AS BIGINT) AS distortion
    FROM codes GROUP BY vec_id ORDER BY vec_id"""

  /** Shared ADC retrieval (q145/q146): per (query < 10, sub, code) the
    * exact sub-distance table (`graft.plans.PqDistTable`), then each
    * candidate's approximate distance is the sum of its 8 code lookups
    * (`graft.plans.PqAdc`), ranked ascending with id tiebreak.
    */
  private val pqAdcRanked = s"""
    qt AS (
      SELECT q.vec_id AS query_id, c.sub, c.code,
             CAST(list_sum(list_transform(range(1, 9), i ->
               (q.qe[c.sub * 8 + i] - c.cv[i]) * (q.qe[c.sub * 8 + i] - c.cv[i])))
               AS BIGINT) AS d2
      FROM (SELECT vec_id, qe FROM base WHERE vec_id < 10) q CROSS JOIN cents c),
    adc AS (
      SELECT t.query_id, x.vec_id AS id, CAST(sum(t.d2) AS BIGINT) AS d2
      FROM codes x JOIN qt t ON t.sub = x.sub AND t.code = x.code
      WHERE x.vec_id <> t.query_id
      GROUP BY t.query_id, x.vec_id),
    ranked AS (
      SELECT query_id, id, d2,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY d2 ASC, id ASC) AS INTEGER) AS rank
      FROM adc)"""

  /** q145: PQ ADC top-10 over the compressed codes. */
  private val q145 = s"""
    $pqPrefix,
    $pqAdcRanked
    SELECT query_id, id, d2, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q146: PQ recall@10 vs the exact quantized brute force — q129's
    * recall protocol over the ADC ranking.
    */
  private val q146 = s"""
    $pqPrefix,
    $pqAdcRanked,
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    qs AS (SELECT vec_id AS query_id, qe AS qq, n2v AS qn2 FROM n2 WHERE vec_id < 10),
    approx AS (SELECT query_id, id FROM ranked WHERE rank <= 10),
    bf AS (
      SELECT query_id, id FROM (
        SELECT q.query_id, n.vec_id AS id,
               row_number() OVER (PARTITION BY q.query_id
                 ORDER BY round(${qcos("qe", "qq", "n2v", "qn2")}, 6) DESC, n.vec_id ASC) AS rank
        FROM n2 n CROSS JOIN qs q
        WHERE n.vec_id <> q.query_id)
      WHERE rank <= 10),
    per AS (
      SELECT b.query_id,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(count(a.id) AS BIGINT) AS n_hit
      FROM bf b LEFT JOIN approx a ON a.query_id = b.query_id AND a.id = b.id
      GROUP BY b.query_id)
    SELECT query_id, n_exact, n_hit,
           round(CAST(n_hit AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) AS recall,
           round(CAST(sum(n_hit) OVER () AS DOUBLE)
                 / CAST(sum(n_exact) OVER () AS DOUBLE), 6) AS micro_recall
    FROM per
    ORDER BY query_id"""

  /** q147: the expectations report — each check re-derived as plain
    * SQL (NULL-skip semantics spelled out per check; `unique`
    * violations = rows in over-represented keys; `foreign_key` = the
    * dangling-key anti-join count).
    */
  private val q147 = """
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             o_orderpriority,
             CASE WHEN o_custkey % 10 = 0 THEN NULL
                  ELSE o_orderstatus END AS status_nullable
      FROM orders),
    rep AS (
      SELECT 'not_null' AS "check", 'o_custkey' AS "column",
             CAST(count(*) AS BIGINT) AS checked,
             CAST(count(*) - count(o_custkey) AS BIGINT) AS violations FROM o
      UNION ALL
      SELECT 'not_null', 'status_nullable', CAST(count(*) AS BIGINT),
             CAST(count(*) - count(status_nullable) AS BIGINT) FROM o
      UNION ALL
      SELECT 'accepted_values', 'o_orderstatus',
             CAST(count(o_orderstatus) AS BIGINT),
             CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                            AND o_orderstatus NOT IN ('F', 'O', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM o
      UNION ALL
      SELECT 'accepted_values', 'o_orderpriority',
             CAST(count(o_orderpriority) AS BIGINT),
             CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                            AND o_orderpriority NOT IN
                              ('1-URGENT', '2-HIGH', '3-MEDIUM')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM o
      UNION ALL
      SELECT 'in_range', 'o_totalprice',
             CAST(count(o_totalprice) AS BIGINT),
             CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                            AND (CAST(o_totalprice AS DOUBLE) < 0.0
                                 OR CAST(o_totalprice AS DOUBLE) > 300000.0)
                           THEN 1 ELSE 0 END) AS BIGINT) FROM o
      UNION ALL
      SELECT 'matches_regex', 'o_orderpriority',
             CAST(count(o_orderpriority) AS BIGINT),
             CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                            AND NOT regexp_matches(o_orderpriority,
                                                   '^[0-9]-[A-Z ]+$')
                           THEN 1 ELSE 0 END) AS BIGINT) FROM o
      UNION ALL
      SELECT 'row_count_between', '*', CAST(count(*) AS BIGINT),
             CAST(CASE WHEN count(*) < 1
                        OR count(*) > 1000000000000 THEN 1 ELSE 0 END
               AS BIGINT) FROM o
      UNION ALL
      SELECT 'unique', 'o_orderkey', CAST(sum(n) AS BIGINT),
             CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
      FROM (SELECT count(*) AS n FROM o GROUP BY o_orderkey)
      UNION ALL
      SELECT 'unique', 'o_custkey', CAST(sum(n) AS BIGINT),
             CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
      FROM (SELECT count(*) AS n FROM o GROUP BY o_custkey)
      UNION ALL
      SELECT 'foreign_key', 'o_custkey',
             CAST((SELECT count(*) FROM o WHERE o_custkey IS NOT NULL)
               AS BIGINT),
             CAST((SELECT count(*) FROM o
                   WHERE o_custkey IS NOT NULL
                     AND o_custkey NOT IN (SELECT c_custkey FROM customer))
               AS BIGINT)
      UNION ALL
      SELECT 'foreign_key', 'o_orderkey',
             CAST((SELECT count(*) FROM o WHERE o_orderkey IS NOT NULL)
               AS BIGINT),
             CAST((SELECT count(*) FROM o
                   WHERE o_orderkey IS NOT NULL
                     AND o_orderkey NOT IN (SELECT c_custkey FROM customer
                                            WHERE c_custkey % 2 = 0))
               AS BIGINT))
    SELECT "check", "column", checked, violations,
           CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
    FROM rep
    ORDER BY "check", "column" """

  /** q148: PSI drift report — the add-one-smoothed fixed-point
    * derivation (`psi_fp = Σ (cr·tc − cc·tr)·(log2fp(cr·tc) −
    * log2fp(cc·tr))`) with the q113/q135 10-step recursive-CTE log2
    * over the union of products; `psi_bits` divides by the smoothed
    * total product and 2¹⁰ only at the end.
    */
  private val q148 = """
    WITH RECURSIVE o AS (
      SELECT o_orderstatus, o_orderpriority,
             CASE WHEN o_totalprice IS NULL THEN '__null__'
                  ELSE '[' ||
                       CAST(CAST(floor(CAST(o_totalprice AS DOUBLE) / 50000.0)
                                 * 50000.0 AS DECIMAL(20,2)) AS VARCHAR) ||
                       ',' ||
                       CAST(CAST((floor(CAST(o_totalprice AS DOUBLE) / 50000.0)
                                  + 1) * 50000.0 AS DECIMAL(20,2)) AS VARCHAR) ||
                       ')' END AS price_bin,
             CAST(o_orderdate AS DATE) < DATE '1998-07-01' AS is_ref
      FROM orders
      WHERE CAST(o_orderdate AS DATE) < DATE '1998-07-01'
         OR o_totalprice < 300000.0),
    rows_u AS (
      SELECT 'o_orderstatus' AS col_name,
             coalesce(o_orderstatus, '__null__') AS category, is_ref FROM o
      UNION ALL
      SELECT 'o_orderpriority', coalesce(o_orderpriority, '__null__'), is_ref
      FROM o
      UNION ALL
      SELECT 'price_bin', price_bin, is_ref FROM o),
    cnt AS (
      SELECT col_name, category,
             CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
      FROM rows_u GROUP BY col_name, category),
    tot AS (
      SELECT col_name,
             CAST(sum(n_ref) AS BIGINT) AS tr0,
             CAST(sum(n_cur) AS BIGINT) AS tc0,
             CAST(count(*) AS BIGINT) AS n_categories,
             CAST(sum(CASE WHEN n_ref = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
             CAST(sum(CASE WHEN n_cur = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_vanished
      FROM cnt GROUP BY col_name),
    sm AS (
      SELECT c.col_name, c.category,
             (c.n_ref + 1) * (t.tc0 + t.n_categories) AS a,
             (c.n_cur + 1) * (t.tr0 + t.n_categories) AS b
      FROM cnt c JOIN tot t ON t.col_name = c.col_name),
    vals AS (
      SELECT DISTINCT v FROM (
        SELECT a AS v FROM sm UNION ALL SELECT b FROM sm)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    terms AS (
      SELECT s.col_name,
             CAST(sum(CAST(s.a - s.b AS HUGEINT) * (la.r - lb.r))
               AS DECIMAL(38,0)) AS psi_fp
      FROM sm s JOIN lg la ON la.v = s.a JOIN lg lb ON lb.v = s.b
      GROUP BY s.col_name)
    SELECT t.col_name AS "column", t.n_categories, t.n_new, t.n_vanished,
           CAST(tm.psi_fp AS VARCHAR) AS psi_fp,
           round(CAST(tm.psi_fp AS DOUBLE)
                 / (CAST(t.tr0 + t.n_categories AS DOUBLE)
                    * CAST(t.tc0 + t.n_categories AS DOUBLE)) / 1024.0, 6)
             AS psi_bits
    FROM tot t JOIN terms tm ON tm.col_name = t.col_name
    ORDER BY "column" """

  /** q149: leakage-safe split — q55's cluster walk, then the fold is
    * the CLUSTER's h60 draw (doc-level draws are exactly the
    * contamination hazard the operator exists to remove).
    */
  private val q149 = s"""
    ${q48Chunks.replaceFirst("WITH canon", "WITH RECURSIVE canon")}
    , cset AS (
      SELECT DISTINCT doc_id, chunk_md5 FROM chunks),
    sized AS (
      SELECT doc_id, chunk_md5,
             count(*) OVER (PARTITION BY doc_id) AS n_chunks
      FROM cset),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sized a JOIN sized b
        ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING round(CAST(count(*) AS DOUBLE) / least(min(a.n_chunks), min(b.n_chunks)), 6) >= 0.5),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id),
    cc AS (
      SELECT id, CAST(min(comp) AS BIGINT) AS comp FROM walk GROUP BY id),
    lab AS (
      SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN cc c ON d.doc_id = c.id),
    drawn AS (
      SELECT doc_id, cluster_id,
             CAST(${h60("'csplit:' || CAST(cluster_id AS VARCHAR)")} AS DOUBLE)
               / 1152921504606846976.0 AS u
      FROM lab)
    SELECT doc_id, cluster_id,
           CASE WHEN u < 0.1 THEN 'test'
                WHEN u < 0.2 THEN 'val'
                ELSE 'train' END AS split
    FROM drawn
    ORDER BY doc_id"""

  /** q150: Fellegi–Sunter linkage — weights re-derived from the same
    * ppm literals through the 10-step log2 recursion (independent of
    * the engine's driver-side scalar), agreement predicates and the
    * planted perturbations replicated exactly.
    */
  private val q150 = s"""
    WITH RECURSIVE ca AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
      FROM customer),
    cb0 AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0
                  THEN substring(c_name, 1, 11) || 'x' ||
                       substring(c_name, 13, 1000)
                  ELSE c_name END AS c_name,
             c_nationkey, c_mktsegment,
             CASE WHEN c_custkey % 13 = 0 THEN c_acctbal + 0.01
                  ELSE c_acctbal END AS c_acctbal
      FROM customer WHERE c_custkey % 31 <> 0),
    cb AS (
      SELECT *, CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
      FROM cb0),
    vals AS (
      SELECT DISTINCT v FROM (
        SELECT 990000 AS v UNION ALL SELECT 1000 UNION ALL
        SELECT 10000 UNION ALL SELECT 999000 UNION ALL
        SELECT 995000 UNION ALL SELECT 500 UNION ALL
        SELECT 5000 UNION ALL SELECT 999500)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    w AS (
      SELECT
        (SELECT r FROM lg WHERE v = 990000) -
          (SELECT r FROM lg WHERE v = 1000) AS wna,
        (SELECT r FROM lg WHERE v = 10000) -
          (SELECT r FROM lg WHERE v = 999000) AS wnd,
        (SELECT r FROM lg WHERE v = 995000) -
          (SELECT r FROM lg WHERE v = 500) AS wba,
        (SELECT r FROM lg WHERE v = 5000) -
          (SELECT r FROM lg WHERE v = 999500) AS wbd),
    flag AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             coalesce(levenshtein(a.c_name, b.c_name) <= 1, FALSE)
               AS c_name_agree,
             coalesce(a.c_acctbal IS NOT DISTINCT FROM b.c_acctbal, FALSE)
               AS c_acctbal_agree
      FROM ca a JOIN cb b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.bal_bucket = b.bal_bucket),
    sc AS (
      SELECT id_a, id_b, c_name_agree, c_acctbal_agree,
             CAST((CASE WHEN c_name_agree THEN w.wna ELSE w.wnd END) +
                  (CASE WHEN c_acctbal_agree THEN w.wba ELSE w.wbd END)
               AS BIGINT) AS score_fp
      FROM flag CROSS JOIN w)
    SELECT id_a, id_b, c_name_agree, c_acctbal_agree, score_fp,
           CASE WHEN score_fp >= 15360 THEN 'match'
                WHEN score_fp >= 2000 THEN 'possible'
                ELSE 'non_match' END AS verdict
    FROM sc
    WHERE score_fp >= 2000
    ORDER BY id_a, id_b"""

  /** q151: IVF-PQ — q36's coarse-cell derivation (hash-picked
    * centroids, nProbe = 4) restricting q145's ADC scoring: a
    * candidate scores only when its assigned cell is probed by the
    * query.
    */
  private val q151 = s"""
    $pqPrefix,
    n2 AS (
      SELECT vec_id, qe,
             CAST(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS BIGINT) AS n2v
      FROM base),
    icents AS (
      SELECT CAST(row_number() OVER (ORDER BY h) AS INTEGER) - 1 AS centroid_id,
             qe AS cq, n2v AS cn2
      FROM (SELECT vec_id, qe, n2v,
                   ${h60("'ivf:' || CAST(vec_id AS VARCHAR)")} AS h
            FROM n2 ORDER BY h LIMIT 16)),
    asg AS (
      SELECT vec_id, centroid_id FROM (
        SELECT n2.vec_id, icents.centroid_id,
               row_number() OVER (PARTITION BY n2.vec_id
                 ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC,
                          centroid_id ASC) AS rn
        FROM n2 CROSS JOIN icents)
      WHERE rn = 1),
    qs2 AS (SELECT vec_id AS query_id, qe, n2v FROM n2 WHERE vec_id < 10),
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT qs2.query_id, icents.centroid_id,
               row_number() OVER (PARTITION BY qs2.query_id
                 ORDER BY (${qcos("qe", "cq", "n2v", "cn2")}) DESC,
                          centroid_id ASC) AS rn
        FROM qs2 CROSS JOIN icents)
      WHERE rn <= 4),
    qt AS (
      SELECT q.vec_id AS query_id, c.sub, c.code,
             CAST(list_sum(list_transform(range(1, 9), i ->
               (q.qe[c.sub * 8 + i] - c.cv[i]) * (q.qe[c.sub * 8 + i] - c.cv[i])))
               AS BIGINT) AS d2
      FROM (SELECT vec_id, qe FROM base WHERE vec_id < 10) q CROSS JOIN cents c),
    adc AS (
      SELECT t.query_id, x.vec_id AS id, CAST(sum(t.d2) AS BIGINT) AS d2
      FROM codes x
      JOIN asg ON asg.vec_id = x.vec_id
      JOIN probes p ON p.centroid_id = asg.centroid_id
      JOIN qt t ON t.sub = x.sub AND t.code = x.code
               AND t.query_id = p.query_id
      WHERE x.vec_id <> t.query_id
      GROUP BY t.query_id, x.vec_id),
    ranked AS (
      SELECT query_id, id, d2,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY d2 ASC, id ASC) AS INTEGER) AS rank
      FROM adc)
    SELECT query_id, id, d2, rank
    FROM ranked WHERE rank <= 10
    ORDER BY query_id, rank"""

  /** q152: CUBE subtotal mart — grouping-set labels via GROUPING();
    * NULLS FIRST ordering spelled out (DuckDB defaults NULLS LAST on
    * ASC, Spark NULLS FIRST).
    */
  private val q152 = """
    WITH e AS (
      SELECT event_type, CAST(ts AS DATE) AS day, user_id, value
      FROM events)
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           round(sum(value), 2) AS sum_value,
           CAST(GROUPING(event_type, day) AS INTEGER) AS gid
    FROM e
    GROUP BY CUBE(event_type, day)
    ORDER BY gid, event_type ASC NULLS FIRST, day ASC NULLS FIRST"""

  /** q153: pivot mart — conditional aggregation, dense zeros. */
  private val q153 = """
    SELECT CAST(ts AS DATE) AS day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY CAST(ts AS DATE)
    ORDER BY day"""

  /** Shared q154/q155 sparse-daily frame: exact-micros daily sums with
    * the day-of-month % 7 = 3 days punched out.
    */
  private val sparseDaily = """
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
               AS BIGINT) AS v_fp
      FROM events
      GROUP BY event_type, CAST(ts AS DATE)
      HAVING dayofmonth(CAST(ts AS DATE)) % 7 <> 3)"""

  /** q154: gap fill — per-group spine, forward fill IGNORE NULLS,
    * repairs flagged.
    */
  private val q154 = s"""
    WITH $sparseDaily,
    b AS (SELECT event_type, min(day) AS lo, max(day) AS hi
          FROM daily GROUP BY event_type),
    spine AS (
      SELECT event_type,
             CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM b),
    j AS (
      SELECT s.event_type, s.day, d.v_fp
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day)
    SELECT event_type, day, v_fp,
           last_value(v_fp IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fp_filled,
           v_fp IS NULL AS was_gap
    FROM j
    ORDER BY event_type, day"""

  /** q155: trailing 7-day rolling mean over the SPARSE frame — RANGE
    * on the date, so punched days shrink the window. The mean of ≤ 7
    * exact integers is order-free in doubles, then one 2dp round.
    */
  private val q155 = s"""
    WITH $sparseDaily
    SELECT event_type, day, v_fp,
           round(avg(v_fp) OVER (
             PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW), 2)
             AS v_fp_roll
    FROM daily
    ORDER BY event_type, day"""

  /** q156: q150's derivation with DuckDB's own
    * `jaro_winkler_similarity` as the name comparator (no acctbal
    * nudge in this fixture).
    */
  private val q156 = s"""
    WITH RECURSIVE ca AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
      FROM customer),
    cb AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0
                  THEN substring(c_name, 1, 11) || 'x' ||
                       substring(c_name, 13, 1000)
                  ELSE c_name END AS c_name,
             c_nationkey, c_mktsegment, c_acctbal,
             CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_bucket
      FROM customer WHERE c_custkey % 31 <> 0),
    vals AS (
      SELECT DISTINCT v FROM (
        SELECT 990000 AS v UNION ALL SELECT 1000 UNION ALL
        SELECT 10000 UNION ALL SELECT 999000 UNION ALL
        SELECT 995000 UNION ALL SELECT 500 UNION ALL
        SELECT 5000 UNION ALL SELECT 999500)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    w AS (
      SELECT
        (SELECT r FROM lg WHERE v = 990000) -
          (SELECT r FROM lg WHERE v = 1000) AS wna,
        (SELECT r FROM lg WHERE v = 10000) -
          (SELECT r FROM lg WHERE v = 999000) AS wnd,
        (SELECT r FROM lg WHERE v = 995000) -
          (SELECT r FROM lg WHERE v = 500) AS wba,
        (SELECT r FROM lg WHERE v = 5000) -
          (SELECT r FROM lg WHERE v = 999500) AS wbd),
    flag AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             coalesce(jaro_winkler_similarity(a.c_name, b.c_name) >= 0.94,
               FALSE) AS c_name_agree,
             coalesce(a.c_acctbal IS NOT DISTINCT FROM b.c_acctbal, FALSE)
               AS c_acctbal_agree
      FROM ca a JOIN cb b
        ON a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND a.bal_bucket = b.bal_bucket),
    sc AS (
      SELECT id_a, id_b, c_name_agree, c_acctbal_agree,
             CAST((CASE WHEN c_name_agree THEN w.wna ELSE w.wnd END) +
                  (CASE WHEN c_acctbal_agree THEN w.wba ELSE w.wbd END)
               AS BIGINT) AS score_fp
      FROM flag CROSS JOIN w)
    SELECT id_a, id_b, c_name_agree, c_acctbal_agree, score_fp,
           CASE WHEN score_fp >= 15360 THEN 'match'
                WHEN score_fp >= 2000 THEN 'possible'
                ELSE 'non_match' END AS verdict
    FROM sc
    WHERE score_fp >= 2000
    ORDER BY id_a, id_b"""

  /** q157: exact percentiles — `quantile_cont` over the same integer
    * cents, identical linear-interpolation semantics.
    */
  private val q157 = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.5) / 100.0, 4) AS p50,
           round(quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.9) / 100.0, 4) AS p90,
           round(quantile_cont(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT), 0.99) / 100.0, 4) AS p99
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  /** q158: 5 rounds of fixed-point integer PageRank over the
    * customer→supplier purchase graph, unrolled as one CTE triple
    * (contribution, dangling mass, next rank) per round — DuckDB's
    * recursive CTEs disallow aggregating the recursive term, so the
    * deterministic fixed iteration count becomes generated SQL
    * instead. `//` on the always-nonnegative ranks is Spark's `DIV`.
    */
  private val q158: String = {
    val scale = 1L << 20
    val teleport = 15L * scale / 100L // = ((dampDen-dampNum)*scale) DIV dampDen
    val iters = 5
    val rounds = (1 to iters).map { k =>
      val p = s"r${k - 1}"
      s"""c$k AS (
      SELECT r.node AS src, r.rank_fp // d.deg AS c
      FROM $p r JOIN deg d ON d.src = r.node),
    dm$k AS (
      SELECT CAST(coalesce(sum(r.rank_fp), 0) AS BIGINT) AS dm
      FROM $p r LEFT JOIN deg d ON d.src = r.node
      WHERE d.src IS NULL),
    r$k AS (
      SELECT nd.node,
             CAST($teleport AS BIGINT) +
               85 * (coalesce(i.inr, 0) +
                     (SELECT dm FROM dm$k) // (SELECT n FROM nn)) // 100
               AS rank_fp
      FROM nodes nd
      LEFT JOIN (SELECT e.dst AS node, CAST(sum(c.c) AS BIGINT) AS inr
                 FROM e JOIN c$k c ON c.src = e.src
                 GROUP BY e.dst) i ON i.node = nd.node)"""
    }.mkString(",\n    ")
    s"""
    WITH e AS (
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
             CAST(l_suppkey AS BIGINT) + 10000000 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
    r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank_fp FROM nodes),
    $rounds
    SELECT node, rank_fp FROM r$iters ORDER BY node"""
  }

  /** q159: PMI collocations — bigrams via a 1-based list lambda
    * (`w[i] || ' ' || w[i+1]`), corpus totals BEFORE the support
    * filter, and the score as the identical sum of fixed-point log2
    * floors over the distinct argument set (the q113/BM25 10-step
    * recursive CTE).
    */
  private val q159 = """
    WITH RECURSIVE toks AS (
      SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                         t -> t <> '') AS w
      FROM documents),
    uni AS (SELECT u AS w, CAST(count(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(w) AS u FROM toks) GROUP BY u),
    tu AS (SELECT CAST(sum(cnt) AS BIGINT) AS tu FROM uni),
    bi AS (SELECT b, CAST(count(*) AS BIGINT) AS c_ab FROM (
             SELECT unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i + 1])) AS b FROM toks)
           GROUP BY b),
    tb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS tb FROM bi),
    cand AS (
      SELECT string_split(b, ' ')[1] AS w1, string_split(b, ' ')[2] AS w2, c_ab
      FROM bi WHERE c_ab >= 5),
    j AS (
      SELECT c.w1, c.w2, c.c_ab, ua.cnt AS ca, ub.cnt AS cb, tu.tu, tb.tb
      FROM cand c
      JOIN uni ua ON ua.w = c.w1
      JOIN uni ub ON ub.w = c.w2
      CROSS JOIN tu CROSS JOIN tb),
    vals AS (SELECT DISTINCT v FROM (
      SELECT c_ab AS v FROM j
      UNION ALL SELECT ca FROM j
      UNION ALL SELECT cb FROM j
      UNION ALL SELECT tu FROM j
      UNION ALL SELECT tb FROM j)),
    lg0 AS (SELECT v, length(bin(v)) - 1 AS m FROM vals),
    lgi(v, i, x, r) AS (
      SELECT v, 0,
             CASE WHEN m <= 30 THEN v << (30 - m) ELSE v >> (m - 30) END,
             CAST(m AS BIGINT)
      FROM lg0
      UNION ALL
      SELECT v, i + 1,
             CASE WHEN y >= 2147483648 THEN y >> 1 ELSE y END,
             CASE WHEN y >= 2147483648 THEN r * 2 + 1 ELSE r * 2 END
      FROM (SELECT v, i, (x * x) >> 30 AS y, r FROM lgi WHERE i < 10)),
    lg AS (SELECT v, r FROM lgi WHERE i = 10),
    pmi AS (
      SELECT j.w1, j.w2, j.c_ab,
             lab.r + 2 * ltu.r - ltb.r - lca.r - lcb.r AS pmi_fp
      FROM j
      JOIN lg lab ON lab.v = j.c_ab
      JOIN lg lca ON lca.v = j.ca
      JOIN lg lcb ON lcb.v = j.cb
      JOIN lg ltu ON ltu.v = j.tu
      JOIN lg ltb ON ltb.v = j.tb)
    SELECT w1, w2, c_ab, pmi_fp FROM pmi
    ORDER BY pmi_fp DESC, w1, w2 LIMIT 100"""

  /** q160: 4 rounds of SEEDED fixed-point PageRank over the symmetric
    * purchase graph — q158's unrolled-CTE recipe with the teleport and
    * initial mass restricted to nation-0 customers via the seeded
    * quotients `(scale·n)//m` and `(15·scale·n)//(100·m)`.
    */
  private val q160: String = {
    val scale = 1L << 20
    val iters = 4
    val rounds = (1 to iters).map { k =>
      val p = s"r${k - 1}"
      s"""c$k AS (
      SELECT r.node AS src, r.rank_fp // d.deg AS c
      FROM $p r JOIN deg d ON d.src = r.node),
    dm$k AS (
      SELECT CAST(coalesce(sum(r.rank_fp), 0) AS BIGINT) AS dm
      FROM $p r LEFT JOIN deg d ON d.src = r.node
      WHERE d.src IS NULL),
    r$k AS (
      SELECT nd.node,
             CASE WHEN nd.seed THEN (SELECT tp FROM tpv) ELSE 0 END +
               85 * (coalesce(i.inr, 0) +
                     CASE WHEN nd.seed
                          THEN (SELECT dm FROM dm$k) // (SELECT m FROM mm)
                          ELSE 0 END) // 100
               AS rank_fp
      FROM nodesf nd
      LEFT JOIN (SELECT e.dst AS node, CAST(sum(c.c) AS BIGINT) AS inr
                 FROM e JOIN c$k c ON c.src = e.src
                 GROUP BY e.dst) i ON i.node = nd.node)"""
    }.mkString(",\n    ")
    s"""
    WITH e0 AS (
      SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
             CAST(l_suppkey AS BIGINT) + 10000000 AS p
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
    e AS (SELECT c AS src, p AS dst FROM e0 UNION SELECT p, c FROM e0),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    seeds AS (SELECT CAST(c_custkey AS BIGINT) AS node FROM customer
              WHERE c_nationkey = 0
              INTERSECT SELECT node FROM nodes),
    nodesf AS (SELECT n.node, s.node IS NOT NULL AS seed
               FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM seeds),
    tpv AS (SELECT (15 * $scale * (SELECT n FROM nn)) //
                   (100 * (SELECT m FROM mm)) AS tp),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
    r0 AS (SELECT node,
             CASE WHEN seed
                  THEN ($scale * (SELECT n FROM nn)) // (SELECT m FROM mm)
                  ELSE 0 END AS rank_fp
           FROM nodesf),
    $rounds
    SELECT node, rank_fp FROM r$iters ORDER BY node"""
  }

  /** q161: triangle census of the top-3 co-purchase backbone — the
    * identical kNN selection (count desc, partner-id asc), canonical
    * undirected edges, (degree, id) orientation via row comparison,
    * ordered-wedge self-join closed by EXISTS, and the `//`
    * fixed-point clustering coefficient.
    */
  private val q161 = """
    WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    co AS (SELECT a.l_suppkey AS s1, b.l_suppkey AS s2,
                  CAST(count(*) AS BIGINT) AS w
           FROM os a JOIN os b ON a.l_orderkey = b.l_orderkey
            AND a.l_suppkey <> b.l_suppkey
           GROUP BY 1, 2),
    knn AS (SELECT s1, s2 FROM (
             SELECT s1, s2,
                    row_number() OVER (PARTITION BY s1 ORDER BY w DESC, s2) AS rn
             FROM co) WHERE rn <= 3),
    e AS (SELECT DISTINCT CAST(least(s1, s2) AS BIGINT) AS a,
                 CAST(greatest(s1, s2) AS BIGINT) AS b
          FROM knn WHERE s1 <> s2),
    deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
             SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node),
    o AS (SELECT CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.a ELSE e.b END AS src,
                 CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN e.b ELSE e.a END AS dst,
                 CASE WHEN (da.deg, e.a) < (db.deg, e.b) THEN db.deg ELSE da.deg END AS dd
          FROM e JOIN deg da ON da.node = e.a
                 JOIN deg db ON db.node = e.b),
    tri AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
            FROM o e1 JOIN o e2 ON e2.src = e1.src
             AND (e1.dd, e1.dst) < (e2.dd, e2.dst)
            WHERE EXISTS (SELECT 1 FROM o e3
                          WHERE e3.src = e1.dst AND e3.dst = e2.dst)),
    pn AS (SELECT node, CAST(count(*) AS BIGINT) AS tri_cnt FROM (
            SELECT u AS node FROM tri
            UNION ALL SELECT v FROM tri
            UNION ALL SELECT w FROM tri) GROUP BY node)
    SELECT d.node, d.deg,
           CAST(coalesce(p.tri_cnt, 0) AS BIGINT) AS tri_cnt,
           CAST(CASE WHEN d.deg >= 2
                     THEN (2 * coalesce(p.tri_cnt, 0) * 1000000) //
                          (d.deg * (d.deg - 1))
                     ELSE 0 END AS BIGINT) AS cc_fp
    FROM deg d LEFT JOIN pn p ON p.node = d.node
    ORDER BY d.node"""

  /** q162: heavy hitters — the brute-force HAVING form the two-pass
    * engine path must equal exactly (strict `>` on the N/30 share).
    */
  private val q162 = """
    WITH tok AS (
      SELECT unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                   '\s+'), t -> t <> '')) AS token
      FROM documents),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM tok GROUP BY token
    HAVING count(*) * 30 > (SELECT n FROM n)
    ORDER BY cnt DESC, token"""

  /** q163: association rules — identical incidence (distinct
    * user-day/type), Apriori prune at 50 baskets, ordered pair counts,
    * and the `//` confidence/lift quotients.
    */
  private val q163 = """
    WITH inc AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' ||
             CAST(CAST(ts AS DATE) AS VARCHAR) AS basket,
             event_type AS item
      FROM events),
    n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM inc),
    s AS (SELECT item, CAST(count(*) AS BIGINT) AS supp
          FROM inc GROUP BY item HAVING count(*) >= 50),
    inc2 AS (SELECT i.basket, i.item FROM inc i
             JOIN s ON s.item = i.item),
    p AS (SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS ps
          FROM inc2 x JOIN inc2 y
            ON x.basket = y.basket AND x.item < y.item
          GROUP BY 1, 2 HAVING count(*) >= 50),
    d AS (SELECT a AS antecedent, b AS consequent, ps FROM p
          UNION ALL SELECT b, a, ps FROM p)
    SELECT d.antecedent, d.consequent, d.ps AS pair_supp,
           d.ps * 1000000 // sa.supp AS conf_fp,
           d.ps * (SELECT n FROM n) * 1000000 // (sa.supp * sb.supp) AS lift_fp
    FROM d JOIN s sa ON sa.item = d.antecedent
           JOIN s sb ON sb.item = d.consequent
    ORDER BY conf_fp DESC, antecedent, consequent"""

  /** q166: q163 with the hot-basket cap active — prune on PRE-drop
    * supports (the deterministic gate), drop baskets with more than 3
    * frequent items, then recompute supports and N over the KEPT
    * incidence so every score divides counts from one population.
    */
  private val q166 = """
    WITH inc AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' ||
             CAST(CAST(ts AS DATE) AS VARCHAR) AS basket,
             event_type AS item
      FROM events),
    s0 AS (SELECT item FROM inc GROUP BY item HAVING count(*) >= 50),
    inc2 AS (SELECT i.basket, i.item FROM inc i JOIN s0 ON s0.item = i.item),
    oversized AS (SELECT basket FROM inc2 GROUP BY basket
                  HAVING count(*) > 3),
    kept AS (SELECT basket, item FROM inc2
             WHERE basket NOT IN (SELECT basket FROM oversized)),
    n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n FROM kept),
    s AS (SELECT item, CAST(count(*) AS BIGINT) AS supp
          FROM kept GROUP BY item),
    p AS (SELECT x.item AS a, y.item AS b, CAST(count(*) AS BIGINT) AS ps
          FROM kept x JOIN kept y
            ON x.basket = y.basket AND x.item < y.item
          GROUP BY 1, 2 HAVING count(*) >= 50),
    d AS (SELECT a AS antecedent, b AS consequent, ps FROM p
          UNION ALL SELECT b, a, ps FROM p)
    SELECT d.antecedent, d.consequent, d.ps AS pair_supp,
           d.ps * 1000000 // sa.supp AS conf_fp,
           d.ps * (SELECT n FROM n) * 1000000 // (sa.supp * sb.supp) AS lift_fp
    FROM d JOIN s sa ON sa.item = d.antecedent
           JOIN s sb ON sb.item = d.consequent
    ORDER BY conf_fp DESC, antecedent, consequent"""

  /** q167: the deterministic level-sampling quantile sketch re-derived
    * end-to-end: h60 per order key, leading-zero level, the minimal
    * level whose suffix count is ≤ k = 1024, the retained sample's XOR
    * digest, and the ceil(q%·m) order statistics — all exact integers
    * (mirrors [[graft.operators.QuantileSketch]]).
    */
  private val q167 = """
    WITH r AS (
      SELECT o_orderpriority AS grp,
             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
               AS BIGINT) AS h,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders),
    lv AS (
      SELECT grp, h, v,
             60 - (CASE WHEN h = 0 THEN 0 ELSE length(bin(h)) END) AS lev
      FROM r),
    suf AS (
      SELECT grp, lev,
             sum(count(*)) OVER (PARTITION BY grp ORDER BY lev DESC) AS s
      FROM lv GROUP BY grp, lev),
    lsel AS (
      SELECT grp,
             CAST(coalesce(max(lev) FILTER (WHERE s > 1024) + 1, 0)
               AS INTEGER) AS level
      FROM suf GROUP BY grp),
    samp AS (
      SELECT l.grp, l.h, l.v,
             row_number() OVER (PARTITION BY l.grp ORDER BY l.v, l.h) AS rk,
             count(*) OVER (PARTITION BY l.grp) AS m
      FROM lv l JOIN lsel t ON t.grp = l.grp AND l.lev >= t.level),
    n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_rows FROM r GROUP BY grp)
    SELECT n.grp AS o_orderpriority, n.n_rows, t.level,
           CAST(max(s.m) AS INTEGER) AS m_samples,
           bit_xor(s.h) AS sample_hash_xor,
           max(CASE WHEN s.rk = (s.m * 50 + 99) // 100 THEN s.v END) AS p50_cents,
           max(CASE WHEN s.rk = (s.m * 90 + 99) // 100 THEN s.v END) AS p90_cents,
           max(CASE WHEN s.rk = (s.m * 99 + 99) // 100 THEN s.v END) AS p99_cents
    FROM samp s JOIN lsel t ON t.grp = s.grp JOIN n ON n.grp = s.grp
    GROUP BY n.grp, n.n_rows, t.level
    ORDER BY o_orderpriority"""

  /** q177: laddered quantile sketch — q167's level-sample derivation at
    * buffer capacity 1024 (suffix counts → minimal level), then the
    * deterministic compactor cascade unrolled as four CONDITIONAL
    * rounds: each round re-ranks the survivors by (value, hash) and
    * keeps every other row, the odd/even choice being the parity of
    * `bit_count(bit_xor(h))` over that round's retained set — a pure
    * function of the set, exactly the Scala cascade's hash-coin. A
    * round is a no-op once ≤ 64 rows remain (`m <= 64 OR rk % 2 =
    * coin`), so four rounds always suffice (⌈1024/2⁴⌉ = 64). `rounds`
    * counts the rounds that actually fired.
    */
  private val q177 = {
    def round(j: Int): String = s"""
    c$j AS (
      SELECT grp, h, v FROM (
        SELECT grp, h, v,
               row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rk,
               count(*) OVER (PARTITION BY grp) AS m,
               bit_count(bit_xor(h) OVER (PARTITION BY grp)) % 2 AS coin
        FROM c${j - 1})
      WHERE m <= 64 OR rk % 2 = coin),
    m$j AS (SELECT grp, count(*) AS m FROM c$j GROUP BY grp)"""
    s"""
    WITH r AS (
      SELECT o_orderpriority AS grp,
             CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
               AS BIGINT) AS h,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders),
    lv AS (
      SELECT grp, h, v,
             60 - (CASE WHEN h = 0 THEN 0 ELSE length(bin(h)) END) AS lev
      FROM r),
    suf AS (
      SELECT grp, lev,
             sum(count(*)) OVER (PARTITION BY grp ORDER BY lev DESC) AS s
      FROM lv GROUP BY grp, lev),
    lsel AS (
      SELECT grp,
             CAST(coalesce(max(lev) FILTER (WHERE s > 1024) + 1, 0)
               AS INTEGER) AS level
      FROM suf GROUP BY grp),
    c0 AS (
      SELECT l.grp, l.h, l.v
      FROM lv l JOIN lsel t ON t.grp = l.grp AND l.lev >= t.level),
    m0 AS (SELECT grp, count(*) AS m FROM c0 GROUP BY grp),
    ${(1 to 4).map(round).mkString(",")},
    fin AS (
      SELECT grp, h, v,
             row_number() OVER (PARTITION BY grp ORDER BY v, h) AS rk,
             count(*) OVER (PARTITION BY grp) AS m
      FROM c4),
    n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_rows FROM r GROUP BY grp)
    SELECT n.grp AS o_orderpriority, n.n_rows, t.level,
           CAST((CASE WHEN m0.m > 64 THEN 1 ELSE 0 END)
              + (CASE WHEN m1.m > 64 THEN 1 ELSE 0 END)
              + (CASE WHEN m2.m > 64 THEN 1 ELSE 0 END)
              + (CASE WHEN m3.m > 64 THEN 1 ELSE 0 END) AS INTEGER) AS rounds,
           CAST(max(f.m) AS INTEGER) AS m_samples,
           bit_xor(f.h) AS sample_hash_xor,
           max(CASE WHEN f.rk = (f.m * 50 + 99) // 100 THEN f.v END) AS p50_cents,
           max(CASE WHEN f.rk = (f.m * 90 + 99) // 100 THEN f.v END) AS p90_cents,
           max(CASE WHEN f.rk = (f.m * 99 + 99) // 100 THEN f.v END) AS p99_cents
    FROM fin f
    JOIN lsel t ON t.grp = f.grp JOIN n ON n.grp = f.grp
    JOIN m0 ON m0.grp = f.grp JOIN m1 ON m1.grp = f.grp
    JOIN m2 ON m2.grp = f.grp JOIN m3 ON m3.grp = f.grp
    GROUP BY n.grp, n.n_rows, t.level, m0.m, m1.m, m2.m, m3.m
    ORDER BY o_orderpriority"""
  }

  /** q179: streamed quantile state — the q167 derivation with the
    * STREAM's parameters: inclusion coin h60(o_custkey) (the stream
    * keys both sketch legs on the key column; duplicate keys rise and
    * fall together, mirrored here by hashing the same key), capacity
    * 128. The oracle recomputes from the whole orders table; the Spark
    * side folds committed per-batch streamed sketches — canonical
    * merge makes the hashes coincide.
    */
  private val q179 = """
    WITH r AS (
      SELECT o_orderpriority AS grp,
             CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
               AS BIGINT) AS h,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders),
    lv AS (
      SELECT grp, h, v,
             60 - (CASE WHEN h = 0 THEN 0 ELSE length(bin(h)) END) AS lev
      FROM r),
    suf AS (
      SELECT grp, lev,
             sum(count(*)) OVER (PARTITION BY grp ORDER BY lev DESC) AS s
      FROM lv GROUP BY grp, lev),
    lsel AS (
      SELECT grp,
             CAST(coalesce(max(lev) FILTER (WHERE s > 128) + 1, 0)
               AS INTEGER) AS level
      FROM suf GROUP BY grp),
    samp AS (
      SELECT l.grp, l.h, l.v,
             row_number() OVER (PARTITION BY l.grp ORDER BY l.v, l.h) AS rk,
             count(*) OVER (PARTITION BY l.grp) AS m
      FROM lv l JOIN lsel t ON t.grp = l.grp AND l.lev >= t.level),
    n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_rows FROM r GROUP BY grp)
    SELECT n.grp AS o_orderpriority, n.n_rows, t.level,
           CAST(max(s.m) AS INTEGER) AS m_samples,
           bit_xor(s.h) AS sample_hash_xor,
           max(CASE WHEN s.rk = (s.m * 50 + 99) // 100 THEN s.v END) AS p50_cents,
           max(CASE WHEN s.rk = (s.m * 90 + 99) // 100 THEN s.v END) AS p90_cents,
           max(CASE WHEN s.rk = (s.m * 99 + 99) // 100 THEN s.v END) AS p99_cents
    FROM samp s JOIN lsel t ON t.grp = s.grp JOIN n ON n.grp = s.grp
    GROUP BY n.grp, n.n_rows, t.level
    ORDER BY o_orderpriority"""

  /** Shared CTE chain for q182/q183: per-doc chars-per-token Q10 loss,
    * per-domain mean, corpus mean, clamped η·excess, then the
    * [[graft.functions.FixedPoint.pow2fp]] bit loop unrolled — the ten
    * Q30 constants verbatim — and the Q20 normalization with ε = 1/10
    * uniform smoothing. Ends at CTE `wt(domain, n_docs, mean_loss_fp,
    * excess_fp, weight_fp)`.
    */
  /** One EG reweighting round as a CTE chain over a per-doc source
    * `src(doc_id, source, n_tokens, loss_fp)`, every name prefixed
    * with `p` so the chain composes (q190 runs it twice — round 1 over
    * the corpus, round 2 over the resampled survivors): per-domain
    * mean, corpus mean, clamped η·excess, the pow2 bit loop, Q20
    * normalization. Ends at `${p}wt(domain, n_docs, mean_loss_fp,
    * excess_fp, weight_fp)`.
    */
  private def doremiRoundCtes(src: String, p: String): String = {
    val consts = Seq(1518500249L, 1276901416L, 1170923761L, 1121280435L,
      1097253708L, 1085434105L, 1079572135L, 1076653033L, 1075196443L,
      1074468887L)
    val steps = consts.zipWithIndex.map { case (c, b) =>
      val bit = 1L << (9 - b)
      s"""
      ${p}p${b + 1} AS (
        SELECT * REPLACE (CASE WHEN frac & $bit = $bit
                               THEN (r * $c) >> 30 ELSE r END AS r)
        FROM ${p}p$b)"""
    }.mkString(",")
    s"""
    ${p}dm AS (
      SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(loss_fp) // count(*) AS BIGINT) AS mean_loss_fp
      FROM $src GROUP BY source),
    ${p}cm AS (SELECT CAST(sum(loss_fp) // count(*) AS BIGINT) AS corpus_fp
           FROM $src),
    ${p}e AS (
      SELECT domain, n_docs, mean_loss_fp,
             greatest(0, mean_loss_fp - corpus_fp) AS excess_fp,
             least(20480, greatest(0, mean_loss_fp - corpus_fp) * 32 // 1)
               AS arg
      FROM ${p}dm, ${p}cm),
    ${p}p0 AS (
      SELECT domain, n_docs, mean_loss_fp, excess_fp,
             arg >> 10 AS i, arg & 1023 AS frac,
             CAST(1073741824 AS BIGINT) AS r
      FROM ${p}e),$steps,
    ${p}pw AS (
      SELECT domain, n_docs, mean_loss_fp, excess_fp,
             CASE WHEN i <= 20 THEN r >> (20 - i)
                  ELSE r << (i - 20) END AS u_fp
      FROM ${p}p10),
    ${p}z AS (SELECT CAST(sum(u_fp) AS BIGINT) AS z, count(*) AS d
              FROM ${p}pw),
    ${p}wt AS (
      SELECT domain, n_docs, mean_loss_fp, excess_fp,
             CAST((9 * (u_fp * 1048576 // z) + (1048576 // d)) // 10
               AS BIGINT) AS weight_fp
      FROM ${p}pw, ${p}z)"""
  }

  private val doremiWeightCtes: String = s"""
    WITH pd AS (
      SELECT doc_id, lang, source, n_tokens,
             CASE WHEN n_tokens > 0
                  THEN length(t) * 1024 // n_tokens ELSE 0 END AS loss_fp
      FROM (
        SELECT doc_id, lang, source, coalesce(text, '') AS t,
               CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
                         ELSE len(string_split_regex(trim(coalesce(text, '')),
                                                     '\\s+')) END AS BIGINT)
                 AS n_tokens
        FROM documents
        WHERE source IS NOT NULL)),
    ${doremiRoundCtes("pd", "")}"""

  /** q182: the DoReMi-style learned weight table, hash-exact. */
  private val q182 = doremiWeightCtes + """
    SELECT domain, n_docs, mean_loss_fp, excess_fp, weight_fp
    FROM wt ORDER BY domain"""

  /** q183: q89's mixture machinery at q182's LEARNED weights — rate =
    * `least(1, budget·(weight_fp/2^20)/domain_tokens)`, then the same
    * deterministic h60 draw.
    */
  private val q183 = doremiWeightCtes + s""",
    tot AS (
      SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS dt
      FROM pd GROUP BY source),
    rt AS (
      SELECT t.source,
             CASE WHEN t.dt > 0
                  THEN least(1.0, 20000.0 * (w.weight_fp / 1048576.0) / t.dt)
                  ELSE 0.0 END AS rate
      FROM tot t JOIN wt w ON w.domain = t.source)
    SELECT pd.doc_id, pd.lang, pd.source, pd.n_tokens
    FROM pd JOIN rt ON pd.source = rt.source
    WHERE CAST(${h60("'mixture:' || CAST(pd.doc_id AS VARCHAR)")} AS DOUBLE)
          / 1152921504606846976.0 < rt.rate
    ORDER BY pd.doc_id"""

  /** q190: TWO DoReMi rounds end-to-end — round-1 weights (q182's
    * chain), the q183 resample at those weights, losses refreshed over
    * the survivors (the per-doc loss is a pure function of the doc, so
    * the refresh is the restriction to pd2), round-2 weights over the
    * resampled corpus via the SAME parameterized chain with `r2_`
    * prefixes. Output: both rounds' weight tables under a `round`
    * column.
    */
  private val q190 = doremiWeightCtes + s""",
    tot AS (
      SELECT source, CAST(sum(n_tokens) AS DOUBLE) AS dt
      FROM pd GROUP BY source),
    rt AS (
      SELECT t.source,
             CASE WHEN t.dt > 0
                  THEN least(1.0, 20000.0 * (w.weight_fp / 1048576.0) / t.dt)
                  ELSE 0.0 END AS rate
      FROM tot t JOIN wt w ON w.domain = t.source),
    pd2 AS (
      SELECT pd.* FROM pd JOIN rt ON pd.source = rt.source
      WHERE CAST(${h60("'mixture:' || CAST(pd.doc_id AS VARCHAR)")} AS DOUBLE)
            / 1152921504606846976.0 < rt.rate),
    ${doremiRoundCtes("pd2", "r2_")}
    SELECT 1 AS round, domain, n_docs, mean_loss_fp, excess_fp, weight_fp
    FROM wt
    UNION ALL
    SELECT 2 AS round, domain, n_docs, mean_loss_fp, excess_fp, weight_fp
    FROM r2_wt
    ORDER BY round, domain"""

  /** q164: MAD outliers — same daily fixed-point sums, same planted
    * 13th-of-month spikes, both medians via `quantile_cont` in the
    * exact ×2/×4 integer units, same cross-multiplied flag.
    */
  private val q164 = """
    WITH daily0 AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 1000000) AS BIGINT))
               AS BIGINT) AS v_fp
      FROM events GROUP BY 1, 2),
    daily AS (
      SELECT event_type, day,
             CASE WHEN dayofmonth(day) = 13 THEN v_fp * 9 ELSE v_fp END AS v_fp
      FROM daily0),
    m AS (SELECT event_type,
                 CAST(quantile_cont(v_fp, 0.5) * 2 AS BIGINT) AS med_x2
          FROM daily GROUP BY 1),
    dv AS (SELECT d.event_type, d.day, d.v_fp, m.med_x2,
                  abs(d.v_fp * 2 - m.med_x2) AS dev_x2
           FROM daily d JOIN m USING (event_type)),
    md AS (SELECT event_type,
                  CAST(quantile_cont(dev_x2, 0.5) * 2 AS BIGINT) AS mad_x4
           FROM dv GROUP BY 1)
    SELECT dv.event_type, dv.day, dv.v_fp, dv.med_x2, md.mad_x4,
           13490000 * dev_x2 > 10000 * 3500 * md.mad_x4 AS is_outlier
    FROM dv JOIN md USING (event_type)
    ORDER BY event_type, day"""

  /** q165: Markov transitions — identical lead() pairing on
    * (ts, event_id) and the integer probability quotient.
    */
  private val q165 = """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id) AS next_type
      FROM events),
    p AS (SELECT event_type AS from_type, next_type AS to_type,
                 CAST(count(*) AS BIGINT) AS n_trans
          FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS tot
          FROM p GROUP BY 1)
    SELECT p.from_type, p.to_type, p.n_trans,
           p.n_trans * 1000000 // t.tot AS p_fp
    FROM p JOIN t USING (from_type)
    ORDER BY from_type, to_type"""

  val all: Map[String, String] = Map(
    "q33_sql_correlated" -> q33,
    "q35_string_functions" -> q35,
    "q38_salted_agg" -> q38,
    "q39_sessionize" -> q39,
    "q01_pricing_summary" -> q01,
    "q02_filter_project" -> q02,
    "q03_join_star" -> q03,
    "q04_semi_join" -> q04,
    "q05_anti_join" -> q05,
    "q06_conditional_agg" -> q06,
    "q07_count_distinct" -> q07,
    "q08_window_latest" -> q08,
    "q09_topk" -> q09,
    "q10_union_dedup" -> q10,
    "q11_scd2_merge" -> q11,
    "q12_upsert" -> q12,
    "q13_decorrelated_agg" -> q13,
    "q14_events_by_day" -> q14,
    "q15_salary_parse" -> q15,
    "q16_posted_date" -> q16,
    "q17_fingerprint" -> q17,
    "q18_date_functions" -> q18,
    "q19_tumbling_window" -> q19,
    "q20_dedup_exact" -> q20,
    "q21_dedup_canonical" -> q21,
    "q22_minhash_lsh" -> q22,
    "q23_simhash" -> q23,
    "q24_ngram_jaccard" -> q24,
    "q25_embedding_neardup" -> q25,
    "q26_ann_topk" -> q26,
    "q27_ann_lsh" -> q27,
    "q28_mart_agg" -> q28,
    "q29_langid" -> q29,
    "q30_quality" -> q30,
    "q31_corpus_stats" -> q31,
    "q32_recent_errors" -> q32,
    "q36_ann_ivf" -> q36,
    "q37_corpus_annotate" -> q37,
    "q40_sample_split" -> q40,
    "q41_rolling_fingerprint" -> q41,
    "q42_percentiles" -> q42,
    "q43_rollup" -> q43,
    "q44_asof_join" -> q44,
    "q45_json_extract" -> q45,
    "q46_window_suite" -> q46,
    "q47_fuzzy_match" -> q47,
    "q48_cdc_chunks" -> q48,
    "q49_multimodal_meta" -> q49,
    "q50_corpus_filter" -> q50,
    "q51_pack_sequences" -> q51,
    "q52_chunk_overlap" -> q52,
    "q53_weighted_sample" -> q53,
    "q54_range_join" -> q54,
    "q55_dedup_clusters" -> q55,
    "q56_funnel" -> q56,
    "q57_retention" -> q57,
    "q58_tfidf_terms" -> q58,
    "q59_pii_redact" -> q59,
    "q60_bloom_join" -> q60,
    "q61_interval_join" -> q61,
    "q62_hll_distinct" -> q62,
    "q63_countmin" -> q63,
    "q64_pivot" -> q64,
    "q65_zscore_outliers" -> q65,
    "q66_unpivot" -> q66,
    "q67_histogram" -> q67,
    "q68_decontaminate" -> q68,
    "q69_repetition" -> q69,
    "q70_cube" -> q70,
    "q71_quality_report" -> q71,
    "q72_frame_sample" -> q72,
    "q73_moving_avg" -> q73,
    "q74_date_spine" -> q74,
    "q75_salted_join" -> q75,
    "q76_group_cap" -> q76,
    "q77_set_ops" -> q77,
    "q78_quantile_hist" -> q78,
    "q79_date_dim_rollup" -> q79,
    "q80_incremental_neardup" -> q80,
    "q81_incremental_ivf" -> q81,
    "q82_incremental_simhash" -> q82,
    "q83_incremental_embedding" -> q83,
    "q84_incremental_tfidf" -> q84,
    "q85_incremental_clusters" -> q85,
    "q86_incremental_exact" -> q86,
    "q87_delete_neardup" -> q87,
    "q88_delete_clusters" -> q88,
    "q89_mixture_sample" -> q89,
    "q90_duplicate_spans" -> q90,
    "q91_excise_spans" -> q91,
    "q92_incremental_spans" -> q92,
    "q93_decontaminate_spans" -> q93,
    "q94_decontaminate_excise" -> q94,
    "q95_training_shards" -> q95,
    "q96_delete_spans" -> q96,
    "q97_delete_ann" -> q97,
    "q98_incremental_shards" -> q98,
    "q99_model_score" -> q99,
    "q100_bpe_vocab" -> q100,
    "q101_bpe_segment" -> q101,
    "q102_delete_simhash" -> q102,
    "q103_delete_embedding" -> q103,
    "q104_corpus_diff" -> q104,
    "q105_version_delta" -> q105,
    "q106_model_bigram" -> q106,
    "q107_image_header" -> q107,
    "q108_av_header" -> q108,
    "q109_nfc_normalize" -> q109,
    "q110_strip_html" -> q110,
    "q111_url_normalize" -> q111,
    "q112_sentence_chunks" -> q112,
    "q113_dsir_select" -> q113,
    "q114_incremental_dsir" -> q114,
    "q115_charlm_ppl" -> q115,
    "q116_dup_lines" -> q116,
    "q117_paragraph_dedup" -> q117,
    "q118_semdedup" -> q118,
    "q119_url_blocklist" -> q119,
    "q120_incremental_paragraphs" -> q120,
    "q121_delete_paragraphs" -> q121,
    "q122_incremental_semdedup" -> q122,
    "q123_dedup_lines" -> q123,
    "q124_charlm_lid" -> q124,
    "q125_temperature_mixture" -> q125,
    "q126_curation_pipeline" -> q126,
    "q127_pack_sequences" -> q127,
    "q128_epoched_mixture" -> q128,
    "q129_ann_recall" -> q129,
    "q130_profile" -> q130,
    "q131_profile_approx" -> q131,
    "q132_lsh_quality" -> q132,
    "q133_train_classifier" -> q133,
    "q134_classifier_eval" -> q134,
    "q135_bm25_topk" -> q135,
    "q136_bm25_incremental" -> q136,
    "q137_fuzzy_match" -> q137,
    "q138_fuzzy_blocks" -> q138,
    "q139_fuzzy_entities" -> q139,
    "q140_bm25_batch" -> q140,
    // q173 runs q140's EXACT workload through the pruned batch path —
    // same oracle text; the hash match is the per-query rank-safety proof
    "q173_bm25_batch_pruned" -> q140,
    "q141_hybrid_search" -> q141,
    // incremental == batch rebuild: the oracle IS q137's batch
    // derivation — the hash match is the incremental-equivalence proof
    "q142_incremental_fuzzy" -> q137,
    "q143_phrase_search" -> q143,
    // q191 serves the SAME phrase query from the persisted positional
    // index (pure additive facts — the round-trip is the claim), so
    // the oracle IS q143's whole-corpus re-derive
    "q191_phrase_indexed" -> q143,
    "q192_hybrid_batch" -> q192,
    "q193_semantic_decontamination" -> q193,
    "q194_bloom_build" -> q194,
    "q195_bloom_rollup" -> q195,
    "q196_bloom_decontaminate" -> q196,
    "q197_bloom_novelty" -> q197,
    "q198_mmr_diverse_topk" -> q198,
    "q199_mmr_batch" -> q199,
    // q202 runs q199's selection through the candidate seam with the
    // persisted-IVF probe as the cut (exhaustive nProbe ⇒ the per-query
    // top-16 IS the brute cut) — value-identical, the oracle IS q199's
    "q202_mmr_ivf_rerank" -> q199,
    "q204_hybrid_recall" -> q204,
    "q205_retrieval_metrics" -> q205,
    "q206_retrieval_summary" -> q206,
    "q207_hard_negatives" -> q207,
    "q208_embedding_drift" -> q208,
    "q209_ngram_diversity" -> q209,
    // q210 runs q207's mining through the candidate seam with the
    // persisted-IVF probe as the candidate stage at an exhaustive
    // nProbe and k = corpus size — every scored pair, identically to
    // the brute scorer by construction, so it shares q207's oracle
    "q210_hard_negatives_ivf" -> q207,
    // q211 is q208 fed from the persisted reference (frozen codebook +
    // reference cell masses) — value-identical by construction
    "q211_embedding_drift_state" -> q208,
    "q212_hybrid_recall_population" -> q212,
    "q213_retrieval_quality_drift" -> q213,
    "q214_ann_recall_dials" -> q214,
    "q200_jl_project" -> q200,
    "q201_jl_rescore" -> q201,
    "q144_pq_encode" -> q144,
    "q145_pq_search" -> q145,
    "q146_pq_recall" -> q146,
    "q147_expectations" -> q147,
    "q148_drift" -> q148,
    "q149_leak_safe_split" -> q149,
    "q150_record_linkage" -> q150,
    "q151_ivfpq_search" -> q151,
    "q152_cube" -> q152,
    "q153_pivot" -> q153,
    "q154_gap_fill" -> q154,
    "q155_rolling" -> q155,
    "q156_linkage_jw" -> q156,
    "q157_percentiles" -> q157,
    "q158_pagerank" -> q158,
    "q159_collocations" -> q159,
    "q161_triangles" -> q161,
    "q162_heavy_hitters" -> q162,
    "q163_assoc_rules" -> q163,
    "q164_mad_outliers" -> q164,
    "q165_transitions" -> q165,
    "q166_assoc_rules_capped" -> q166,
    "q167_quantile_sketch" -> q167,
    "q168_fuzzy_auto_dial" -> q168,
    "q169_unigram_vocab" -> q169,
    "q170_unigram_segment" -> q170,
    // q175 rolls per-month sketches up with MergeAgg; canonical merge
    // makes the result the whole-data sketch, so the oracle IS q167's
    "q175_quantile_rollup" -> q167,
    // q176 merges per-month theta sketches; union-set canonicality
    // makes the result the whole-data sketch — the oracle IS q171's
    "q176_theta_rollup" -> q171,
    "q177_quantile_ladder" -> q177,
    "q178_streamed_theta" -> q171,
    "q179_streamed_quantile" -> q179,
    "q180_fertility_sweep" -> q180,
    // q181 runs q148's workload through the persisted-reference
    // incremental path; value-identical by construction — the oracle
    // IS q148's whole-data recompute
    "q181_incremental_drift" -> q148,
    "q182_domain_mixture" -> q182,
    "q183_doremi_mixture" -> q183,
    // q184 rolls monthly mergeable states up at the ladder's buffer
    // capacity and compacts at read; canonical merge makes the result
    // the whole-data laddered sketch — the oracle IS q177's
    "q184_ladder_rollup" -> q177,
    // q185 re-derives the mixture weights from persisted per-domain
    // loss sums; exact integer sums make it value-identical to the
    // batch path — the oracle IS q182's whole-corpus recompute
    "q185_incremental_mixture" -> q182,
    "q186_rrf_fusion" -> q186,
    // q189 serves the SAME fusion from persisted indexes (rank-safe
    // BM25 impact probe + exhaustive IVF cell sweep) — value-identical
    // by construction, so the oracle IS q186's whole-corpus re-derive
    "q189_hybrid_index_fusion" -> q186,
    "q190_doremi_two_round" -> q190,
    // q203 feeds BOTH rounds of the same loop from persisted loss-stat
    // state (weightsFromState over appended increments; exact integer
    // sums ⇒ state-fed == batch-lazy) — the oracle IS q190's
    "q203_doremi_state_fed" -> q190,
    // q187/q188 roll monthly HLL registers (register-wise MAX) and
    // CountMin cells (cell-wise SUM) up — both merges are the
    // whole-data sketch EXACTLY, so the oracles ARE q62's / q63's
    "q187_hll_rollup" -> q62,
    "q188_countmin_rollup" -> q63,
    "q171_theta_distinct" -> q171,
    "q172_theta_intersect" -> q172,
    // q174: the two hash-verified segmentation chains composed as
    // self-contained subqueries, rolled up to corpus fertility per
    // tokenizer (sum is HUGEINT in DuckDB — cast back; ‰ fixed point)
    "q174_tokenizer_compare" -> s"""
      SELECT tokenizer, n_docs, total_tokens, avg_tokens_fp FROM (
        SELECT 'bpe' AS tokenizer, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_bpe_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(n_bpe_tokens) * 1000 // count(*) AS BIGINT)
                 AS avg_tokens_fp
        FROM ($q101)
        UNION ALL
        SELECT 'unigram', CAST(count(*) AS BIGINT),
               CAST(sum(n_unigram_tokens) AS BIGINT),
               CAST(sum(n_unigram_tokens) * 1000 // count(*) AS BIGINT)
        FROM ($q170))
      ORDER BY tokenizer""",
    "q160_seeded_pagerank" -> q160,
  ).map { case (k, v) => k -> v.stripMargin.trim.replaceAll("\\s+", " ") }
}
