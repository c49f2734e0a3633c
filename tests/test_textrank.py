"""TextRank keyword scoring (`graph.textrank_scores`).

Cross-checks the distributed power iteration against an independent
scalar replica of the documented integer contract (top-k vocab with
count-desc/term-asc tie-break, vocab-restricted adjacent bigram edges,
(r·w)//out_w contributions, 15/85 damping, dangling mass dropped).
"""

import numpy as np
import pandas as pd
import ray.data as rd

from beats_ray.dataops.graph import textrank_scores

SCALE = 1_000_000_000


def scalar_textrank(texts, vocab_k, iters):
    from collections import Counter

    toks = [[w for w in t.lower().split() if w] for t in texts]
    cnt = Counter(w for ws in toks for w in ws)
    vocab = sorted(cnt, key=lambda w: (-cnt[w], w))[:vocab_k]
    vset = set(vocab)
    edges = Counter()
    for ws in toks:
        for a, b in zip(ws, ws[1:]):
            if a in vset and b in vset:
                edges[(a, b)] += 1
    ow = Counter()
    for (a, _b), w in edges.items():
        ow[a] += w
    n = len(vocab)
    start = SCALE // n
    base = (15 * start) // 100
    r = {v: start for v in vocab}
    for _ in range(iters):
        inc = {v: 0 for v in vocab}
        for (a, b), w in edges.items():
            inc[b] += (r[a] * w) // ow[a]
        r = {v: base + (85 * inc[v]) // 100 for v in vocab}
    return pd.DataFrame({"term": sorted(vocab),
                         "rank_ur": [r[v] for v in sorted(vocab)]})


def _texts(seed, n_docs=40, n_words=30):
    rng = np.random.RandomState(seed)
    words = [f"w{i}" for i in range(25)]
    return [" ".join(rng.choice(words, size=n_words)) for _ in range(n_docs)]


def test_textrank_matches_scalar_replica(ray_session):
    for seed, vocab_k, iters in [(3, 20, 3), (4, 10, 2)]:
        texts = _texts(seed)
        ds = rd.from_pandas(pd.DataFrame({"text": texts}))
        got = (textrank_scores(ds, vocab_k=vocab_k, iters=iters)
               .sort_values("term").reset_index(drop=True))
        want = scalar_textrank(texts, vocab_k, iters)
        pd.testing.assert_frame_equal(
            got.astype({"rank_ur": np.int64}),
            want.astype({"rank_ur": np.int64}))


def test_textrank_layout_independent(ray_session):
    texts = _texts(9)
    df = pd.DataFrame({"text": texts})
    a = (textrank_scores(rd.from_pandas(df).repartition(1), vocab_k=15)
         .sort_values("term").reset_index(drop=True))
    b = (textrank_scores(rd.from_pandas(
            df.sample(frac=1.0, random_state=1).reset_index(drop=True))
            .repartition(7), vocab_k=15)
         .sort_values("term").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_textrank_hub_outranks_leaf(ray_session):
    # 'hub' follows every other word; leaves only ever precede it
    texts = [f"x{i} hub" for i in range(20)] * 3
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    got = textrank_scores(ds, vocab_k=25, iters=3)
    ranks = dict(zip(got["term"], got["rank_ur"]))
    assert ranks["hub"] > max(v for t, v in ranks.items() if t != "hub")


def test_textrank_empty_corpus(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"text": ["", "   "]}))
    got = textrank_scores(ds, vocab_k=10)
    assert len(got) == 0
