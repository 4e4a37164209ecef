"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Generates the (repo, path, commit, lang, content) table fully distributed —
spark.range + mapInPandas, no driver-side rows — and deterministic per doc
index regardless of partitioning (each doc's randomness comes from a Philox
generator keyed on the doc index, so sf/partition changes never change a doc).

Characteristics (FIXTURES.md §1):
- ~sqrt(N) repos, unique (repo, path);
- content: 50..1500 tokens from a 50k-term Zipfian vocabulary (s≈1.1) — head
  terms exercise skew-salting exactly like crawled web text would;
- embedded cross-file reference tokens `ref://repoX/pathY` with preferential
  attachment → the link graph for PageRank (analogue of Site.Hyperlinks,
  extraction at crawler/main.go:176-192);
- commit: 40-hex deterministic from (repo, path);
- lang: Zipf-weighted over {python, go, java, js}.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

VOCAB_SIZE = 50_000
ZIPF_S = 1.1
LANGS = ["python", "go", "java", "js"]
LANG_EXT = {"python": "py", "go": "go", "java": "java", "js": "js"}
LANG_CUM = np.array([0.48, 0.74, 0.90, 1.0])
SEED = 42


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def _doc_key(i: int) -> tuple[str, str]:
    """Deterministic (repo, path) for doc index i; ~sqrt spacing of repos."""
    repo_i = int(np.floor(np.sqrt(i)))
    local = i - repo_i * repo_i
    return f"org{repo_i % 97}/repo{repo_i}", local


def synth_corpus(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Build the corpus DataFrame of n_docs rows (lazy; write with .write.parquet)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, (n_docs // 20_000) or 1)
    cdf = _zipf_cdf(VOCAB_SIZE, ZIPF_S)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                rng = np.random.Generator(np.random.Philox(key=SEED, counter=[0, 0, 0, i]))
                repo, local = _doc_key(i)
                lang = LANGS[int(np.searchsorted(LANG_CUM, rng.random()))]
                path = f"src/pkg{local % 13}/mod{local}.{LANG_EXT[lang]}"
                length = 50 + int(rng.random() * rng.random() * 1450)
                terms_idx = np.searchsorted(cdf, rng.random(length))
                toks = [f"t{j}" for j in terms_idx]
                # cross-file references, preferential attachment to low doc ids
                n_refs = int(rng.random() * 8) if i > 0 else 0
                for _ in range(n_refs):
                    tgt = int(i * rng.random() ** 2.5)  # bias to hubs (low ids)
                    if tgt == i:
                        continue
                    trepo, tlocal = _doc_key(tgt)
                    # extension of the target is lang-dependent; reference by stem
                    toks.append(f"ref://{trepo}/src/pkg{tlocal % 13}/mod{tlocal}")
                first_line = f"module mod{local} in {repo}"
                content = first_line + "\n" + " ".join(toks)
                commit = hashlib.md5(f"{repo}/{path}".encode()).hexdigest() + hashlib.md5(
                    f"{path}@{repo}".encode()
                ).hexdigest()[:8]
                rows.append((repo, path, commit[:40], lang, content))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    base = spark.range(0, n_docs, 1, partitions)
    return base.mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")


def ensure_corpus(spark: SparkSession, n_docs: int, out_dir: str) -> str:
    """Materialize the corpus parquet once (idempotent on existing dir)."""
    import os

    path = os.path.join(out_dir, f"corpus_{n_docs}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        synth_corpus(spark, n_docs).write.mode("overwrite").parquet(path)
    return path
