"""Typed configuration + errors for the engine.

Analog of the reference's request model
(``/root/reference/remote_vector_index_builder/core/common/models/index_build_parameters.py:136-174``):
the schema/shape of a job is declared up front and validated with typed errors
(their ``VectorsDatasetError``, ``core/common/exceptions.py:26-31``).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict


class EngineError(Exception):
    """Base class for typed engine errors."""


class SchemaValidationError(EngineError):
    """Input table does not match the declared transcript schema.

    Analog of the reference's parse-time shape validation
    (``core/common/models/vectors_dataset.py:70-84``).
    """


class HashCollisionError(EngineError):
    """Same job id, different parameters (idempotency violation).

    Analog of ``app/services/job_service.py:60-83``.
    """


# The declared transcript input schema (input_hint shape). Column -> Arrow type str.
TRANSCRIPT_SCHEMA = {
    "conv_id": "string",
    "turn_idx": "int32",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp[us]",
}


@dataclass(frozen=True)
class AnalyzerConfig:
    """Index-time analyzer options (the OpenSearch analyzer analog, applied
    on top of the frozen base tokenizer ``[a-z0-9_]+`` runs): a stopword
    filter and token-length gates. The SAME config analyzes queries at
    search time (read back from stats.json), so index and query agree.

    The default config is a no-op — the engine's frozen round-1 tokenizer —
    and keeps job ids byte-stable."""

    stopwords: tuple = ()
    min_token_len: int = 1
    max_token_len: int = 1 << 30
    # token filter applied LAST in the chain (Lucene filter order):
    # "minimal_english" = Lucene EnglishMinimalStemFilter (plural stripping:
    # a final 's' drops unless the token is < 3 chars or ends in 'ss'/'us');
    # "s_stem" = Harman (1991) S-stemmer (three-rule plural conflation:
    # ies->y / es->e / s->; see functions/tokenizer._stem_s_array)
    stemmer: str = ""

    def __post_init__(self):
        if self.stemmer not in ("", "minimal_english", "s_stem"):
            raise EngineError(
                f"unknown stemmer {self.stemmer!r} "
                "(supported: minimal_english, s_stem)"
            )

    def is_default(self) -> bool:
        return (
            not self.stopwords
            and self.min_token_len <= 1
            and self.max_token_len >= (1 << 30)
            and not self.stemmer
        )


@dataclass(frozen=True)
class BM25Config:
    """Scoring + index-format hyperparameters.

    Analog of the reference's typed index hyperparameter objects
    (``faiss_gpu_index_cagra_builder.py:54-176``). Frozen once; the oracle and
    the engine share this object so rank identity is by construction.
    """

    k1: float = 1.2
    b: float = 0.75
    block_size: int = 128          # postings per compressed block (block-max unit)
    # Heavy-hitter salt: postings of one term are sharded by docid range so no
    # single merge group exceeds ~shard_range postings (SURVEY.md section 7,
    # "Very wide groups"). At 10^12 turns a stopword's posting list must span
    # many groups/rows; the querier reads a term's shards in shard order.
    shard_range: int = 1 << 23     # docids per shard (8M)

    def job_fingerprint(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


@dataclass
class BuildConfig:
    """One index-build job.

    ``job_id`` is a deterministic SHA-256 of (inputs, parameters) — the
    idempotency key, analog of ``app/utils/hash.py:12-28``.
    """

    input_paths: list[str] = field(default_factory=list)
    index_dir: str = ""
    bm25: BM25Config = field(default_factory=BM25Config)
    # Number of checkpointable build partitions (groups of input files).
    # Each partition is one resumable unit (segments/part-{pid}), the analog of
    # one remote-build job in the reference. None -> one partition per file,
    # capped at 16.
    num_partitions: int | None = None
    # Dedup exact duplicates of (conv_id, turn_idx) on ingest (first wins).
    dedup: bool = False
    # docid assignment: "dense" validates per-conv dense turn_idx and uses the
    # metadata-light conv-offset path (no global sort); "sort" does a full
    # (conv_id, turn_idx) sort + per-block offsets (general fallback).
    docid_mode: str = "dense"
    # Tokenize/build batch size (docs per batch = docs per SPIMI partial).
    # Bigger batches -> fewer partial rows into the merge shuffle (the
    # per-batch vocabulary grows sublinearly) but fewer, longer map tasks.
    # Measured at sf0.1/32cpu: 4096 -> 4.2M partial rows, map 2.5s;
    # 32768 -> 1.0M rows, map 5.1s (starved CPUs). 16384 balances both and
    # keeps per-batch token memory well under a worker heap.
    batch_size: int = 16384
    # Merge bucket count override (None = sized from input bytes at job
    # start, ~64 MB of input per bucket). Physical-layout knob for the sweep
    # harness; the logical index is identical at any value.
    num_buckets: int | None = None
    # Merge-task memory budget (bytes of in-memory working set). A bucket
    # whose partials would exceed this is merged in term-hash sub-splits
    # (bounded memory, S passes over its files) — the skew guard for
    # stopword-heavy corpora. Execution detail: not part of job_id.
    merge_byte_budget: int = 1 << 30
    # First docid of this build. 0 for a base index; an incremental
    # generation (pipelines/incremental.append_index) sets it to the number
    # of docs already in the index so generations occupy disjoint, ascending
    # docid ranges — the positional-id analog of appending rows to the
    # reference's doc-id blob (``core/common/models/vectors_dataset.py:126-129``).
    docid_base: int = 0
    # Index token positions (Lucene's .pos analog): phase A adds a per-posting
    # positions column to the partials (same tokenize pass; parquet column
    # pruning keeps the BM25 merge reads unchanged) and the merge additionally
    # writes term-bucketed positions/ files. Enables mode="phrase" search.
    # Opt-in: a positional index is roughly corpus-sized (as in Lucene).
    positions: bool = False
    # Index-time analyzer (stopword filter + token-length gates). The default
    # is the frozen no-op tokenizer. Composes with positions=True: filtered
    # tokens advance the position counter without being indexed (Lucene
    # position-increment semantics), so phrase queries see the gaps.
    analyzer: AnalyzerConfig = field(default_factory=AnalyzerConfig)

    def job_id(self) -> str:
        payload = {
            "inputs": sorted(self.input_paths),
            "index_dir": self.index_dir,
            "bm25": self.bm25.job_fingerprint(),
            "dedup": self.dedup,
            "docid_mode": self.docid_mode,
            "docid_base": self.docid_base,
        }
        if self.positions:  # absent for positionless jobs: ids stay stable
            payload["positions"] = True
        if not self.analyzer.is_default():  # absent for default: ids stable
            payload["analyzer"] = json.dumps(asdict(self.analyzer), sort_keys=True)
        return hashlib.sha256(
            json.dumps(payload, sort_keys=True).encode()
        ).hexdigest()
