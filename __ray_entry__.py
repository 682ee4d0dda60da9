"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (transcript index build + BM25 top-k)
at sf0.001. ``queries()`` exposes each implemented operator over ``sf_dir``;
``oracle_sql()`` gives the DuckDB-equivalent SQL. Ray is initialised by the
driver BEFORE import — nothing here calls ray.init()/shutdown().

The transcript table (BASELINE.json input_hint shape) is synthesised
deterministically per scale by ``remote_vector_index_builder_ray.fixtures``
(seed 42) into /tmp/graft_fixtures/<sf>/ — the oracle SQL reads the very same
parquet files via read_parquet().

Float policy for driver-checked outputs: BM25 scores are computed in float64
by both engines but DuckDB's SUM order differs from numpy's, so driver-facing
rankings use (round(score, 6) DESC, docid ASC) on BOTH sides and report the
rounded score. The strict bit-exact rank-identity gate vs the exhaustive
oracle lives in pytest (tests/test_build_search.py).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd

FIXTURE_ROOT = "/tmp/graft_fixtures"
INDEX_ROOT = "/tmp/graft_indexes"

# generate the sf0.01 + sf0.001 fixtures at import time so oracle_sql()'s
# read_parquet() paths exist no matter which side the driver runs first
from remote_vector_index_builder_ray import fixtures as _fx

for _sf in ("sf0.001", "sf0.01"):
    _fx.ensure_fixture(_sf)
_fx.ensure_fixture("sf0.01", with_dups=True)  # dedup_transcripts oracle reads it


def _sf_name(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def _ensure_index(sf_dir: str):
    """Build (resume-aware: completed index is reused) and return paths."""
    from remote_vector_index_builder_ray import BuildConfig, build_index

    name = _sf_name(sf_dir)
    fx = _fx.ensure_fixture(name)
    index_dir = os.path.join(INDEX_ROOT, name)
    cfg = BuildConfig(
        input_paths=fx["transcripts"],
        index_dir=index_dir,
        num_partitions=min(4, len(fx["transcripts"])),
    )
    manifest = build_index(cfg)
    return fx, index_dir, manifest


def _transcripts_glob(sf: str) -> str:
    return f"{FIXTURE_ROOT}/{sf}/transcripts/*.parquet"


def _queries_path(sf: str) -> str:
    return f"{FIXTURE_ROOT}/{sf}/queries.parquet"


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry() -> Any:
    """Build the sf0.001 transcript index and run the reference query set."""
    from remote_vector_index_builder_ray import search

    fx, index_dir, _ = _ensure_index("/root/testdata/sf0.001")
    return search(index_dir, fx["queries"], mode="bmw")


# ---------------------------------------------------------------------------
# core BM25 queries (each with an oracle_sql twin)
# ---------------------------------------------------------------------------


def _q_bm25_topk(sf_dir: str):
    from remote_vector_index_builder_ray import search
    import pyarrow.parquet as pq

    fx, index_dir, _ = _ensure_index(sf_dir)
    q = pq.read_table(fx["queries"]).to_pandas()
    k_by_query = dict(zip(q["query_id"], q["k"]))
    # oversample 2k so the rounded re-rank can't lose a boundary doc
    q2 = q.assign(k=(q["k"] * 2).astype("int32"))
    res = search(index_dir, q2, mode="bmw").to_pandas()
    res["score"] = res["score"].round(6)
    res = res.sort_values(["query_id", "score", "docid"], ascending=[True, False, True])
    res["rank"] = res.groupby("query_id").cumcount() + 1
    res["k"] = res["query_id"].map(k_by_query)
    res = res[res["rank"] <= res["k"]]
    return res[["query_id", "rank", "docid", "score"]].astype(
        {"query_id": "int64", "rank": "int32", "docid": "int64", "score": "float64"}
    ).reset_index(drop=True)


def _q_corpus_stats(sf_dir: str):
    import json

    _, index_dir, man = _ensure_index(sf_dir)
    st = json.load(open(os.path.join(index_dir, "stats.json")))
    return pd.DataFrame(
        {
            "n_docs": pd.Series([st["N"]], dtype="int64"),
            "total_len": pd.Series([st["total_len"]], dtype="int64"),
            "avgdl": pd.Series([round(st["avgdl"], 6)], dtype="float64"),
        }
    )


def _q_term_stats(sf_dir: str):
    import pyarrow.parquet as pq

    _, index_dir, _ = _ensure_index(sf_dir)
    ts = pq.read_table(os.path.join(index_dir, "termstats")).to_pandas()
    return ts[["term", "df", "cf"]].sort_values("term").reset_index(drop=True)


def _q_docids(sf_dir: str):
    import pyarrow.parquet as pq

    _, index_dir, _ = _ensure_index(sf_dir)
    dm = pq.read_table(
        os.path.join(index_dir, "docmeta"), columns=["docid", "conv_id", "turn_idx", "doc_len"]
    ).to_pandas()
    return dm.sort_values("docid").reset_index(drop=True).astype(
        {"docid": "int64", "turn_idx": "int32", "doc_len": "int32"}
    )


# ---------------------------------------------------------------------------
# training-data-pipeline extras over the driver's sf tables
# ---------------------------------------------------------------------------


def _read(sf_dir: str, table: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _q_bm25_hydrated(sf_dir: str):
    """Top-k with stored fields attached (broadcast-semi-join vs docmeta)."""
    from remote_vector_index_builder_ray import search
    from remote_vector_index_builder_ray.pipelines.query import hydrate
    import pyarrow.parquet as pq

    fx, index_dir, _ = _ensure_index(sf_dir)
    topk = _q_bm25_topk(sf_dir)
    import ray.data

    out = hydrate(index_dir, ray.data.from_pandas(topk))
    out = out[["query_id", "rank", "docid", "score", "conv_id", "turn_idx", "role", "text"]]
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True).astype(
        {"turn_idx": "int32"}
    )


def _q_dedup_transcripts(sf_dir: str):
    """Exact (conv_id, turn_idx) dedup over the duplicate-injected variant."""
    import ray.data

    from remote_vector_index_builder_ray.stages.docids import dedup_exact

    fx = _fx.fixture_for_sf_dir(sf_dir, with_dups=True)
    ds = ray.data.read_parquet(fx["transcripts"])
    out = dedup_exact(ds).to_pandas()[["conv_id", "turn_idx", "text"]]
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).astype(
        {"turn_idx": "int32"}
    )


def _q_text_features(sf_dir: str):
    from remote_vector_index_builder_ray.extras.text import text_features_ds

    out = text_features_ds(_read(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_exact_dedup_docs(sf_dir: str):
    from remote_vector_index_builder_ray.extras.dedup import exact_dedup

    out = exact_dedup(_read(sf_dir, "documents")).to_pandas()
    return out.sort_values("content_hash").reset_index(drop=True).astype(
        {"keep_id": "int64", "n_copies": "int64"}
    )


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray.extras.ann import brute_force_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    qdf = emb[emb["vec_id"] < 16].sort_values("vec_id")
    qm = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    return brute_force_topk(_read(sf_dir, "embeddings"), qdf["vec_id"].to_numpy(), qm, k=10)


def _q_embedding_near_dup(sf_dir: str):
    from remote_vector_index_builder_ray.extras.ann import embedding_near_dup_exact

    return embedding_near_dup_exact(_read(sf_dir, "embeddings"), threshold=0.5)


def _q_events_window(sf_dir: str):
    from remote_vector_index_builder_ray.extras.events import tumbling_window_agg

    out = tumbling_window_agg(_read(sf_dir, "events"), window_sec=3600).to_pandas()
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["user_id", "window_start"]).reset_index(drop=True).astype(
        {"user_id": "int64", "window_start": "int64", "n_events": "int64"}
    )


def _q_minhash_pairs(sf_dir: str):
    from remote_vector_index_builder_ray.extras.dedup import minhash_lsh_candidates

    out = minhash_lsh_candidates(_read(sf_dir, "documents")).to_pandas()
    return out[["doc_a", "doc_b"]].sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _q_token_stats(sf_dir: str):
    from remote_vector_index_builder_ray.extras.text import token_stats_ds

    out = token_stats_ds(_read(sf_dir, "documents")).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _q_video_frames(sf_dir: str):
    import ray.data

    from remote_vector_index_builder_ray.extras.multimodal import sample_frames, synth_video_table

    media = ray.data.from_arrow(synth_video_table(100))
    out = sample_frames(media, target_fps=1.0, backend="fake").to_pandas()
    out["feat0"] = out["feature"].map(lambda f: round(float(f[0]), 6))
    return out[["media_id", "frame_idx", "frame_ts_ms", "feat0"]].sort_values(
        ["media_id", "frame_idx"]
    ).reset_index(drop=True)


def _q_ngram_jaccard(sf_dir: str):
    from remote_vector_index_builder_ray.extras.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_read(sf_dir, "documents"), shingle_k=3, threshold=0.2)


def _q_simhash_pairs(sf_dir: str):
    from remote_vector_index_builder_ray.extras.dedup import simhash_pairs

    return simhash_pairs(_read(sf_dir, "documents"), radius=3)


def _q_ann_ivf_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from remote_vector_index_builder_ray.extras.ann import ivf_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
    qdf = emb[emb["vec_id"] < 16].sort_values("vec_id")
    qm = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    return ivf_topk(_read(sf_dir, "embeddings"), qdf["vec_id"].to_numpy(), qm, k=10)


def _q_multimodal_features(sf_dir: str):
    import ray.data

    from remote_vector_index_builder_ray.extras.multimodal import decode_features, synth_media_table

    media = ray.data.from_arrow(synth_media_table(200))
    out = decode_features(media, backend="fake").to_pandas()
    out["feat0"] = out["feature"].map(lambda f: round(float(f[0]), 6))
    return out[["media_id", "mime", "payload_bytes", "feat0"]].sort_values("media_id").reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # core BM25 engine (SQL-checked)
        "bm25_topk": _q_bm25_topk,
        "corpus_stats": _q_corpus_stats,
        "term_stats": _q_term_stats,
        "docids": _q_docids,
        "bm25_hydrated": _q_bm25_hydrated,
        "dedup_transcripts": _q_dedup_transcripts,
        # training-data extras (SQL-checked)
        "text_features": _q_text_features,
        "exact_dedup_docs": _q_exact_dedup_docs,
        "ann_topk": _q_ann_topk,
        "embedding_near_dup": _q_embedding_near_dup,
        "events_window": _q_events_window,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "token_stats": _q_token_stats,
        # approximate / non-SQL-expressible (rows-only check; pytest covers
        # their semantics vs brute-force oracles)
        "minhash_lsh_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "ann_ivf_topk": _q_ann_ivf_topk,
        "multimodal_features": _q_multimodal_features,
        "video_frame_sample": _q_video_frames,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — same tokenizer, same BM25 formula, same tie-break
# ---------------------------------------------------------------------------

from remote_vector_index_builder_ray.extras.text import STOPWORDS_SMALL as _STOPWORDS_SMALL

_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS_SMALL)

# MATERIALIZED: DuckDB's CTE inlining re-derives toks/tf per consumer and the
# optimizer chokes on the resulting plan (empirically: minutes vs seconds)
_TOKS = """
    toks AS MATERIALIZED (
        SELECT docid, unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS term
        FROM docs
    )
"""


def _docs_cte(sf: str) -> str:
    return f"""
    docs AS MATERIALIZED (
        SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS docid,
               conv_id, turn_idx, text
        FROM read_parquet('{_transcripts_glob(sf)}')
    )"""


def oracle_sql() -> dict[str, str]:
    sf = "sf0.01"  # the driver's correctness scale
    docs = _docs_cte(sf)
    return {
        "bm25_topk": f"""
WITH {docs}, {_TOKS},
tf AS MATERIALIZED (SELECT docid, term, count(*)::BIGINT AS tf FROM toks GROUP BY docid, term),
dl AS MATERIALIZED (SELECT docid, count(*)::BIGINT AS dl FROM toks GROUP BY docid),
df AS MATERIALIZED (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
totals AS (SELECT sum(dl)::DOUBLE AS total_len FROM dl),
ndocs AS (SELECT count(*)::BIGINT AS n_docs FROM docs),
stats AS (SELECT n_docs, total_len / n_docs AS avgdl FROM ndocs CROSS JOIN totals),
q AS (
    SELECT query_id, k,
           unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS term
    FROM read_parquet('{_queries_path(sf)}')
),
scored AS (
    SELECT q.query_id, any_value(q.k) AS k, tf.docid,
           sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
    FROM q
    JOIN tf USING (term)
    JOIN df USING (term)
    JOIN dl ON tf.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.query_id, tf.docid
),
ranked AS (
    SELECT query_id, docid, round(score, 6) AS score, k,
           row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, docid) AS rank
    FROM scored
)
SELECT query_id, rank::INT AS rank, docid, score
FROM ranked WHERE rank <= k
ORDER BY query_id, rank
""",
        "corpus_stats": f"""
WITH {docs}, {_TOKS},
dl AS MATERIALIZED (SELECT docid, count(*)::BIGINT AS dl FROM toks GROUP BY docid),
totals AS (SELECT sum(dl)::BIGINT AS total_len FROM dl),
ndocs AS (SELECT count(*)::BIGINT AS n_docs FROM docs)
SELECT n_docs, total_len, round(total_len::DOUBLE / n_docs, 6) AS avgdl
FROM ndocs CROSS JOIN totals
""",
        "term_stats": f"""
WITH {docs}, {_TOKS}
SELECT term, count(DISTINCT docid)::BIGINT AS df, count(*)::BIGINT AS cf
FROM toks GROUP BY term ORDER BY term
""",
        "docids": f"""
WITH {docs}, {_TOKS},
dl AS (SELECT docid, count(*) AS dl FROM toks GROUP BY docid)
SELECT d.docid, d.conv_id, d.turn_idx::INT AS turn_idx,
       coalesce(dl.dl, 0)::INT AS doc_len
FROM docs d LEFT JOIN dl USING (docid)
ORDER BY d.docid
""",
        "bm25_hydrated": f"""
WITH {docs}, {_TOKS},
tf AS MATERIALIZED (SELECT docid, term, count(*)::BIGINT AS tf FROM toks GROUP BY docid, term),
dl AS MATERIALIZED (SELECT docid, count(*)::BIGINT AS dl FROM toks GROUP BY docid),
df AS MATERIALIZED (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
totals AS (SELECT sum(dl)::DOUBLE AS total_len FROM dl),
ndocs AS (SELECT count(*)::BIGINT AS n_docs FROM docs),
stats AS (SELECT n_docs, total_len / n_docs AS avgdl FROM ndocs CROSS JOIN totals),
q AS (
    SELECT query_id, k,
           unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9_]+'))) AS term
    FROM read_parquet('{_queries_path(sf)}')
),
scored AS (
    SELECT q.query_id, any_value(q.k) AS k, tf.docid,
           sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * tf.tf * (1.2 + 1) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl))) AS score
    FROM q
    JOIN tf USING (term)
    JOIN df USING (term)
    JOIN dl ON tf.docid = dl.docid
    CROSS JOIN stats s
    GROUP BY q.query_id, tf.docid
),
ranked AS (
    SELECT query_id, docid, round(score, 6) AS score, k,
           row_number() OVER (PARTITION BY query_id ORDER BY round(score, 6) DESC, docid) AS rank
    FROM scored
),
src AS (
    SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS docid,
           conv_id, turn_idx, role, text
    FROM read_parquet('{_transcripts_glob(sf)}')
)
SELECT r.query_id, r.rank::INT AS rank, r.docid, r.score,
       src.conv_id, src.turn_idx::INT AS turn_idx, src.role, src.text
FROM ranked r JOIN src USING (docid)
WHERE r.rank <= r.k
ORDER BY r.query_id, r.rank
""",
        "dedup_transcripts": f"""
SELECT conv_id, turn_idx::INT AS turn_idx, text
FROM read_parquet('{FIXTURE_ROOT}/{sf}_dups/transcripts/*.parquet')
QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ts, role, text) = 1
ORDER BY conv_id, turn_idx
""",
        "text_features": f"""
WITH t AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents
), f AS (
    SELECT doc_id, len(ts)::BIGINT AS n_tokens, len(list_distinct(ts))::BIGINT AS n_unique,
           CASE WHEN len(ts) = 0 THEN 0.0
                ELSE len(list_filter(ts, x -> x IN ({_STOP_SQL})))::DOUBLE / len(ts) END AS sr,
           CASE WHEN len(ts) = 0 THEN 0.0
                ELSE len(list_distinct(ts))::DOUBLE / len(ts) END AS ur,
           md5(array_to_string(ts, ' ')) AS fingerprint
    FROM t
)
SELECT doc_id, n_tokens, n_unique,
       floor(sr * 1000000 + 0.5) / 1000000 AS stopword_ratio,
       CASE WHEN sr >= 0.1 AND n_tokens >= 3 THEN 'en' ELSE 'unk' END AS lang_id,
       floor((0.5 * least(1.0, n_tokens / 100.0) + 0.3 * ur + 0.2 * least(1.0, sr * 4.0))
             * 1000000 + 0.5) / 1000000 AS quality_score,
       fingerprint
FROM f ORDER BY doc_id
""",
        "exact_dedup_docs": """
WITH t AS (
    SELECT doc_id, md5(array_to_string(regexp_extract_all(lower(text), '[a-z0-9_]+'), ' ')) AS content_hash
    FROM documents
)
SELECT content_hash, min(doc_id)::BIGINT AS keep_id, count(*)::BIGINT AS n_copies
FROM t GROUP BY content_hash ORDER BY content_hash
""",
        "ann_topk": """
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 16),
sims AS (
    SELECT q.query_id, e.vec_id,
           floor(list_cosine_similarity(q.qv, e.v) * 1000000 + 0.5) / 1000000 AS cosine
    FROM q CROSS JOIN e
),
ranked AS (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
    FROM sims
)
SELECT query_id, rank::INT AS rank, vec_id, cosine FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
""",
        "embedding_near_dup": """
WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       floor(list_cosine_similarity(a.v, b.v) * 1000000 + 0.5) / 1000000 AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= 0.5
ORDER BY vec_id_a, vec_id_b
""",
        "ngram_jaccard_pairs": """
WITH t AS MATERIALIZED (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts FROM documents
),
s AS MATERIALIZED (
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(ts) = 0 THEN CAST([] AS VARCHAR[])
             WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
             ELSE [array_to_string(ts[i:i+2], ' ') FOR i IN range(1, len(ts) - 1)]
        END)) AS shingle
    FROM t
),
sz AS (SELECT doc_id, count(*)::BIGINT AS n FROM s GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS i
    FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       floor(i::DOUBLE / (sa.n + sb.n - i) * 1000000 + 0.5) / 1000000 AS jaccard
FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.2
ORDER BY doc_a, doc_b
""",
        "token_stats": r"""
WITH t AS MATERIALIZED (
    -- explicit whitespace class: identical to the engine's WS_TOKEN_PATTERN
    -- (Python \S is Unicode-aware, RE2 \S is not — never use \S here)
    SELECT doc_id, regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS wtoks,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_bpe
    FROM documents
)
SELECT doc_id, len(wtoks)::BIGINT AS n_ws_tokens, n_bpe AS n_bpe_tokens,
       list_reduce(
           list_prepend(0::BIGINT, list_transform(wtoks, x -> (ascii(x) * 131 + len(x))::BIGINT)),
           (acc, v) -> (acc * 1000003 + v) % 2147483647
       )::BIGINT AS rolling_fp
FROM t ORDER BY doc_id
""",
        "events_window": """
SELECT user_id::BIGINT AS user_id,
       ((epoch_us(ts) // 3600000000) * 3600)::BIGINT AS window_start,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
    }
