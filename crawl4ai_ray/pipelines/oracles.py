"""DuckDB oracle SQL for every SQL-expressible query in queries.py.

The corpus is a pure function of ``documents`` (sources/corpus.py), so
the oracle recomputes crawl facts directly in SQL:

* url(doc)   = 'https://site-' || (doc_id%16) || '.example.com/page/' || doc_id
* links      = doc p -> targets 4 + ((p*73 + j*179 + 11) % (N-4)),
               j < 2 + (p%4)
* robots     = host h blocked iff (h%7)==5
* BFS        = recursive CTE expanding only from allowed hosts,
               depth-capped; MIN(depth) == BFS wave depth.

``N`` is written as ``(SELECT count(*) FROM documents)`` so the same
SQL is valid at any scale factor.
"""

CRAWL_DEPTH = 3

_N = "(SELECT count(*) FROM documents)"

_URL = (
    "'https://site-' || CAST(doc_id % 16 AS VARCHAR) || "
    "'.example.com/page/' || CAST(doc_id AS VARCHAR)"
)

_LINKS_CTE = f"""links AS (
  SELECT d.doc_id AS src,
         (4 + ((d.doc_id*73 + r.j*179 + 11) % ({_N} - 4)))::BIGINT AS dst
  FROM documents d, range(0,6) r(j)
  WHERE r.j < 2 + (d.doc_id % 4)
)"""

_CRAWL_CTE = f"""{_LINKS_CTE},
crawl(doc_id, depth) AS (
  SELECT * FROM (VALUES (0::BIGINT,0),(1::BIGINT,0),(2::BIGINT,0),(3::BIGINT,0)) s(doc_id, depth)
  UNION
  SELECT l.dst, c.depth + 1
  FROM crawl c JOIN links l ON l.src = c.doc_id
  WHERE c.depth < {CRAWL_DEPTH} AND ((c.doc_id % 16) % 7) != 5
),
reached AS (
  SELECT doc_id, MIN(depth) AS depth FROM crawl GROUP BY doc_id
)"""


_STOPLIST = ",".join(
    f"'{w}'"
    for w in "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)

_NUMBER_RE = r"\b\d{1,3}(?:[,.\s]\d{3})*(?:\.\d+)?\b"

ORACLES: dict[str, str] = {
    "chunk_counts": """
        SELECT doc_id,
               CAST(ceil(length(regexp_split_to_array(trim(text), '\\s+')) / 20.0) AS BIGINT) AS n_chunks
        FROM documents
        WHERE trim(text) != ''
        ORDER BY doc_id
    """,
    "quality_metrics": f"""
        SELECT doc_id,
          CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
          length(text)::DOUBLE
            / greatest(length(regexp_split_to_array(trim(text), '\\s+')), 1) AS mean_word_len,
          length(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE
            / greatest(length(text), 1) AS punct_ratio,
          length(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> lower(x) IN ({_STOPLIST})))::DOUBLE
            / greatest(length(regexp_split_to_array(trim(text), '\\s+')), 1) AS stop_ratio
        FROM documents ORDER BY doc_id
    """,
    "regex_numbers": f"""
        SELECT event_type,
               CAST(sum(length(regexp_extract_all(props, '{_NUMBER_RE}'))) AS BIGINT) AS n_matches
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "pdf_pages": """
        SELECT doc_id,
               CAST(r.i + 1 AS INT) AS page,
               0 AS n_images
        FROM documents, range(0, 4096) r(i)  -- constant bound: duckdb range() rejects lateral params; docs are < 4096*200 chars
        WHERE r.i < greatest(1, CAST(ceil(length(text) / 200.0) AS BIGINT))
        ORDER BY doc_id, page
    """,
    "ngram_jaccard": """
        WITH sh AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 7) AS g
          FROM documents, range(1, 4096) t(i)  -- constant bound: duckdb range() rejects lateral params; docs are < 4096 chars
          WHERE length(text) >= 7 AND i <= length(text) - 6
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
        ORDER BY doc_a, doc_b
    """,
    "embed_near_dup": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
        ORDER BY vec_a, vec_b
    """,
    "extract_text": f"""
        SELECT {_URL} AS url, text
        FROM documents ORDER BY url
    """,
    "link_stats": f"""
        SELECT {_URL} AS url,
               CAST(2 + (doc_id % 4) AS BIGINT) AS n_internal,
               CAST(3 AS BIGINT) AS n_external
        FROM documents ORDER BY url
    """,
    "host_page_counts": """
        SELECT 'site-' || CAST(doc_id % 16 AS VARCHAR) || '.example.com' AS host,
               count(*) AS n_pages
        FROM documents GROUP BY host ORDER BY host
    """,
    "crawl_reachable": f"""
        WITH RECURSIVE {_CRAWL_CTE}
        SELECT 'https://site-' || CAST(r.doc_id % 16 AS VARCHAR) ||
               '.example.com/page/' || CAST(r.doc_id AS VARCHAR) AS url,
               CAST(r.depth AS BIGINT) AS depth,
               ((r.doc_id % 16) % 7) != 5 AS success
        FROM reached r ORDER BY url
    """,
    "crawl_text": f"""
        WITH RECURSIVE {_CRAWL_CTE}
        SELECT 'https://site-' || CAST(r.doc_id % 16 AS VARCHAR) ||
               '.example.com/page/' || CAST(r.doc_id AS VARCHAR) AS url,
               d.text AS text
        FROM reached r JOIN documents d ON d.doc_id = r.doc_id
        WHERE ((r.doc_id % 16) % 7) != 5
        ORDER BY url
    """,
    "crawl_host_counts": f"""
        WITH RECURSIVE {_CRAWL_CTE}
        SELECT 'site-' || CAST(r.doc_id % 16 AS VARCHAR) || '.example.com' AS host,
               count(*) AS n_crawled
        FROM reached r
        WHERE ((r.doc_id % 16) % 7) != 5
        GROUP BY host ORDER BY host
    """,
    "seen_set": f"""
        WITH RECURSIVE {_CRAWL_CTE}
        SELECT DISTINCT 'https://site-' || CAST(l.dst % 16 AS VARCHAR) ||
               '.example.com/page/' || CAST(l.dst AS VARCHAR) AS url
        FROM reached r JOIN links l ON l.src = r.doc_id
        WHERE r.depth <= {CRAWL_DEPTH} - 1 AND ((r.doc_id % 16) % 7) != 5
        ORDER BY url
    """,
    "train_split": """
        SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
               count(*) AS n_docs
        FROM (SELECT (doc_id * 2654435761 + 97) % 100 AS b FROM documents)
        GROUP BY split ORDER BY split
    """,
    "docs_by_lang": """
        SELECT lang, count(*) AS n_docs FROM documents
        GROUP BY lang ORDER BY lang
    """,
    "top_docs_by_chars": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id ASC LIMIT 20
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 4) AS sum_qty,
               round(sum(l_extendedprice), 4) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "brand_revenue": """
        SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand
    """,
    "segment_totals": """
        SELECT c_mktsegment, round(sum(o_totalprice), 4) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "asof_orders": """
        WITH m AS (
          SELECT e.user_id, e.ts, max(o.o_orderdate) AS d
          FROM events e LEFT JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate < e.ts
          GROUP BY 1, 2
        ),
        pick AS (
          SELECT m.user_id, m.ts, max(o.o_totalprice) AS price
          FROM m LEFT JOIN orders o
            ON o.o_custkey = m.user_id AND o.o_orderdate = m.d
          GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(count(price) AS BIGINT) AS n_matched,
               round(coalesce(max(price), 0.0), 4) AS max_matched_price
        FROM pick GROUP BY user_id ORDER BY user_id
    """,
    "topk_per_group": """
        SELECT c_mktsegment, o_orderkey, round(o_totalprice, 4) AS o_totalprice
        FROM (
          SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                   ORDER BY o.o_totalprice DESC, o.o_orderkey DESC) AS rn
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        )
        WHERE rn <= 3
        ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey DESC
    """,
    "median_event_value": """
        SELECT event_type, round(median(value), 6) AS median_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "window_agg": """
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "sessionize": """
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTE OR
                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ),
        sess AS (
          SELECT user_id, ts,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM gaps
        ),
        per_session AS (
          SELECT user_id, session_id, count(*) AS n FROM sess GROUP BY 1, 2
        )
        SELECT user_id,
               count(*) AS n_sessions,
               CAST(sum(n) AS BIGINT) AS n_events,
               CAST(max(n) AS BIGINT) AS max_session_events
        FROM per_session
        GROUP BY user_id
        ORDER BY user_id
    """,
    "events_by_type": """
        SELECT event_type,
               count(*) AS n_events,
               sum(value) AS sum_value,
               avg(value) AS avg_value
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "dedup_exact": """
        SELECT min(doc_id) AS keep_doc_id FROM documents
        GROUP BY text ORDER BY keep_doc_id
    """,
    "token_counts": """
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN 0
                    ELSE length(regexp_split_to_array(trim(text), '\\s+'))
               END AS n_tokens
        FROM documents ORDER BY doc_id
    """,
    "ann_cosine_topk": """
        SELECT vec_id FROM embeddings
        ORDER BY list_cosine_similarity(embedding,
            (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
            vec_id ASC
        LIMIT 10
    """,
}
