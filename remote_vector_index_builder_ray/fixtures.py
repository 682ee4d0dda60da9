"""Deterministic synthetic transcript + query fixtures (FIXTURES.md).

Mirrors the reference's seeded e2e dataset generator
(``e2e/api/vector_dataset_generator.py:57-134``, seed 42 in
``e2e/api/test-datasets.yml:35-38``): all data is generated locally and
deterministically — no external data. Rows are written SHUFFLED (not in
(conv_id, turn_idx) order) so stable-ordering docID assignment is exercised.

Scales (same generator, same seed, size parameter only):
  sf0.001 -> 2_000 turns / 1 file     (smoke)
  sf0.01  -> 50_000 turns / 4 files   (correctness vs oracle)
  sf0.1   -> 500_000 turns / 16 files (bench)
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
QUERY_SEED = 43
FIXTURE_ROOT = "/tmp/graft_fixtures"

SCALES = {
    "sf0.001": (2_000, 2),
    "sf0.01": (50_000, 4),
    "sf0.1": (500_000, 16),
    # scaling-efficiency runs need enough compute to amortize fixed job
    # latency; generated chunked (per-file seeds) to bound generator memory
    "sfscale": (12_000_000, 24),
}

# ~200 very-high-frequency "stopword" tokens -> realistic heavy-hitter skew.
STOPWORDS = (
    "the and to of a in is it you that he was for on are with as i his they be "
    "at one have this from or had by hot word but what some we can out other "
    "were all there when up use your how said an each she which do their time "
    "if will way about many then them write would like so these her long make "
    "thing see him two has look more day could go come did number sound no "
    "most people my over know water than call first who may down side been now "
    "find any new work part take get place made live where after back little "
    "only round man year came show every good me give our under name very "
    "through just form sentence great think say help low line differ turn "
    "cause much mean before move right boy old too same tell does set three "
    "want air well also play small end put home read hand port large spell add "
    "even land here must big high such follow act why ask men change went "
    "light kind off need house picture try us again animal point mother world "
    "near build self earth father head stand own page should country found "
    "answer school grow study still learn plant cover food sun four between "
    "state keep eye never last let thought city tree cross farm hard start "
    "might story saw far sea draw left late run"
).split()

TOOLS = (
    "bash read grep write edit glob search fetch browse compile test deploy "
    "format lint profile trace diff patch commit push"
).split()

VOCAB_SIZE = 50_000


def _roles_for_conv(rng: np.random.Generator, n_turns: int) -> list[str]:
    roles = []
    if rng.random() < 0.05:
        roles.append("system")
    nxt = "user"
    while len(roles) < n_turns:
        roles.append(nxt)
        if nxt == "assistant" and rng.random() < 0.15:
            nxt = "tool"
        elif nxt == "tool":
            nxt = "user"
        else:
            nxt = "assistant" if nxt == "user" else "user"
    return roles[:n_turns]


def generate_transcripts(
    n_turns: int, seed: int = SEED, with_dups: bool = False
) -> pd.DataFrame:
    """Deterministic transcript table; rows in generation (unsorted) order."""
    rng = np.random.default_rng(seed)
    # conversation sizes ~ clipped geometric, mean 8, max 64
    n_conv_est = max(1, int(n_turns / 8 * 1.5))
    sizes = np.clip(rng.geometric(1 / 8.0, size=n_conv_est), 1, 64)
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns)) + 1
    sizes = sizes[:n_convs]
    sizes[-1] -= int(cum[n_convs - 1] - n_turns) if cum[n_convs - 1] > n_turns else 0
    sizes = sizes[sizes > 0]
    n_convs = len(sizes)
    total = int(sizes.sum())

    conv_ids = np.repeat(np.array([f"conv-{i:08d}" for i in range(n_convs)]), sizes)
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])

    roles: list[str] = []
    for s in sizes:
        roles.extend(_roles_for_conv(rng, int(s)))
    roles_arr = np.array(roles)

    # token counts ~ lognormal(mean ~ 40), max 512; ~1% empty turns
    tok_counts = np.minimum(rng.lognormal(3.4, 0.7, size=total), 512).astype(np.int64)
    tok_counts = np.maximum(tok_counts, 1)
    tok_counts[rng.random(total) < 0.01] = 0

    # tokens: 35% stopwords (zipf over the 200), else vocab word via Zipf(1.07)
    n_tokens = int(tok_counts.sum())
    vocab = np.array([f"w{i:06d}" for i in range(VOCAB_SIZE)])
    stop_arr = np.array(STOPWORDS)
    is_stop = rng.random(n_tokens) < 0.35
    zipf_v = rng.zipf(1.07, size=n_tokens)
    vocab_idx = (zipf_v - 1) % VOCAB_SIZE  # wrap the tail so no single clamp hot-spot
    stop_rank = np.minimum(rng.zipf(1.4, size=n_tokens) - 1, len(stop_arr) - 1)
    words = np.where(is_stop, stop_arr[stop_rank], vocab[vocab_idx])

    bounds = np.concatenate([[0], np.cumsum(tok_counts)])
    # vectorized doc assembly: one big join with NUL separators at doc
    # boundaries, then a single split — identical output to per-doc joins
    # (empty docs -> empty strings), ~10x faster than a Python join loop
    if total > 1:
        # NB: separator must not be "\x00" — numpy fixed-width unicode arrays
        # NUL-pad and silently drop a stored NUL character
        with_sep = np.insert(words, bounds[1:-1].astype(np.int64), "\x01")
        joined = " ".join(with_sep)
        texts = [t.strip(" ") for t in joined.split("\x01")]
    else:
        texts = [" ".join(words[bounds[0] : bounds[1]])]

    # ~1% of turns get punctuation / unicode edge content
    edge_idx = np.flatnonzero(rng.random(total) < 0.01)
    edges = ["café au lait!", "naïve — résumé", "🙂 👍 emoji", "tab\there\ttabs", "...!?;:"]
    for j, i in enumerate(edge_idx):
        texts[i] = (texts[i] + " " + edges[j % len(edges)]).strip()

    tools = np.where(
        roles_arr == "tool", rng.choice(np.array(TOOLS), size=total), ""
    )

    # timestamps: conv start uniform over 2026-01-01..2026-06-30, +1..300 s/turn
    start_lo = np.datetime64("2026-01-01").astype("datetime64[s]").astype(np.int64)
    start_hi = np.datetime64("2026-06-30").astype("datetime64[s]").astype(np.int64)
    conv_starts = rng.integers(start_lo, start_hi, size=n_convs)
    deltas = rng.integers(1, 300, size=total)
    conv_of_turn = np.repeat(np.arange(n_convs), sizes)
    # cumulative within conv: cumsum minus the cumsum at conv start
    cds = np.cumsum(deltas)
    conv_first = np.concatenate([[0], np.cumsum(sizes)])[:-1]
    ts = conv_starts[conv_of_turn] + cds - cds[conv_first][conv_of_turn] + deltas[conv_first][conv_of_turn]

    df = pd.DataFrame(
        {
            "conv_id": conv_ids,
            "turn_idx": turn_idx,
            "role": roles_arr,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts * 1_000_000, unit="us"),
        }
    )
    if with_dups:
        dup = df.sample(frac=0.002, random_state=seed)
        df = pd.concat([df, dup], ignore_index=True)
    # write shuffled so docID assignment is actually exercised
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return df


def generate_queries(n_queries: int = 200, seed: int = QUERY_SEED) -> pd.DataFrame:
    """Frozen reference query set covering rare/stop/mixed/absent/repeated/empty."""
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for i in range(n_queries):
        kind = i % 8
        if kind == 0:  # single rare term
            texts.append(f"w{int(rng.integers(5_000, VOCAB_SIZE)):06d}")
        elif kind == 1:  # single stopword
            texts.append(str(rng.choice(STOPWORDS)))
        elif kind in (2, 3, 4):  # 2-4 mixed-frequency terms
            n = int(rng.integers(2, 5))
            terms = [str(rng.choice(STOPWORDS))] + [
                f"w{int((rng.zipf(1.07) - 1) % VOCAB_SIZE):06d}" for _ in range(n - 1)
            ]
            texts.append(" ".join(terms))
        elif kind == 5:  # terms absent from the corpus
            texts.append(f"zzzmissing{i} qqqabsent{i}")
        elif kind == 6:  # repeated terms within a query
            t = f"w{int((rng.zipf(1.07) - 1) % VOCAB_SIZE):06d}"
            texts.append(f"{t} {t} the {t}")
        else:  # empty / punctuation-only
            texts.append("" if rng.random() < 0.5 else "...!?—")
    return pd.DataFrame(
        {
            "query_id": np.arange(n_queries, dtype=np.int64),
            "text": texts,
            "k": np.full(n_queries, 10, dtype=np.int32),
        }
    )


def ensure_fixture(sf_name: str, root: str = FIXTURE_ROOT, with_dups: bool = False) -> dict:
    """Generate (once, atomically) the transcript + query parquet for a scale.

    Returns {"transcripts": [paths], "queries": path, "dir": base}.
    """
    if sf_name not in SCALES:
        raise ValueError(f"unknown fixture scale {sf_name!r}; known: {list(SCALES)}")
    n_turns, n_files = SCALES[sf_name]
    suffix = "_dups" if with_dups else ""
    base = os.path.join(root, sf_name + suffix)
    done = os.path.join(base, "_SUCCESS")
    tdir = os.path.join(base, "transcripts")
    qpath = os.path.join(base, "queries.parquet")
    if not os.path.exists(done):
        tmp = base + ".tmp"
        os.makedirs(os.path.join(tmp, "transcripts"), exist_ok=True)

        def _write(df: pd.DataFrame, fi: int) -> None:
            tbl = pa.Table.from_pandas(df, preserve_index=False)
            tbl = tbl.set_column(
                tbl.schema.get_field_index("turn_idx"), "turn_idx", tbl["turn_idx"].cast(pa.int32())
            )
            tbl = tbl.set_column(
                tbl.schema.get_field_index("ts"), "ts", tbl["ts"].cast(pa.timestamp("us"))
            )
            path = os.path.join(tmp, "transcripts", f"part-{fi:04d}.parquet")
            pq.write_table(tbl, path + ".part")
            os.replace(path + ".part", path)

        if n_turns > 600_000:
            # chunked: each file generated independently (deterministic per-file
            # seed, so an interrupted generation resumes by skipping files that
            # already exist); conv ids are file-prefixed so conversations never
            # span files
            per = n_turns // n_files
            for fi in range(n_files):
                if os.path.exists(os.path.join(tmp, "transcripts", f"part-{fi:04d}.parquet")):
                    continue
                df = generate_transcripts(per, seed=SEED * 1000 + fi, with_dups=with_dups)
                df["conv_id"] = df["conv_id"].str.replace("conv-", f"conv{fi:02d}-", regex=False)
                _write(df, fi)
        else:
            df = generate_transcripts(n_turns, with_dups=with_dups)
            chunks = np.array_split(np.arange(len(df)), n_files)
            for fi, idx in enumerate(chunks):
                _write(df.iloc[idx], fi)
        pq.write_table(
            pa.Table.from_pandas(generate_queries(), preserve_index=False),
            os.path.join(tmp, "queries.parquet"),
        )
        with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
            f.write("ok")
        shutil.rmtree(base, ignore_errors=True)
        os.replace(tmp, base)
    files = sorted(
        os.path.join(tdir, f) for f in os.listdir(tdir) if f.endswith(".parquet")
    )
    return {"transcripts": files, "queries": qpath, "dir": base}


def fixture_for_sf_dir(sf_dir: str, **kw) -> dict:
    """Map a driver sf dir (/root/testdata/sf0.01) to the matching fixture scale."""
    name = os.path.basename(os.path.normpath(sf_dir))
    return ensure_fixture(name, **kw)
