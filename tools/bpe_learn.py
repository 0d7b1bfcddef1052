"""Learn the FULL BPE merge table over the corpus vocabulary, to
saturation — the offline half of q_bpe_multipass (operators/text.py).

Classic pair-frequency BPE (the public Sennrich 2016 algorithm): start
from characters, repeatedly merge the most frequent adjacent symbol
pair (weighted by corpus word frequency), deterministic tie-break by
the pair itself, until no pair occurs twice — at which point every
remaining pair is a singleton artifact and the table has one rank per
distinct internal node of the vocabulary's merge forest. Output is
seeds/bpe_merges_full.csv (rank,left,right), the same seed contract as
bpe_merges.csv (24 ranks) but ~5x deeper: the table the multi-pass
apply path is certified against.

Usage: python tools/bpe_learn.py [sf_dir] [out_csv]
Deterministic for a given corpus: counts + lexicographic tie-break.
"""

from __future__ import annotations

import collections
import csv
import sys


def learn(word_freq: dict[str, int], min_count: int = 2) -> list[tuple[str, str]]:
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges: list[tuple[str, str]] = []
    while True:
        pairs: collections.Counter = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # deterministic: max count, then lexicographically smallest pair
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append(best)
        left, right = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def corpus_word_freq(sf_dir: str) -> dict[str, int]:
    import duckdb

    rows = duckdb.sql(
        "SELECT t, COUNT(*) AS f FROM ("
        "  SELECT unnest(regexp_extract_all(text,"
        "    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')) AS t"
        f"  FROM read_parquet('{sf_dir}/documents.parquet')"
        ") GROUP BY t ORDER BY t"
    ).fetchall()
    return dict(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "saas_analytics_pipeline_spark/seeds/bpe_merges_full.csv"
    )
    freq = corpus_word_freq(sf_dir)
    # min_count=1: run to full saturation — every vocabulary word ends as
    # a single symbol, the deepest table the corpus supports
    merges = learn(freq, min_count=1)
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["rank", "left", "right"])
        for i, (left, right) in enumerate(merges):
            w.writerow([i, left, right])
    print(f"learned {len(merges)} merges over {len(freq)} words -> {out}")


if __name__ == "__main__":
    main()
