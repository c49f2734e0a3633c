"""Adversarial-input robustness: every text / dedup / sampling stage
over a corpus of the inputs the sf fixtures DON'T contain — empty
strings, whitespace-only rows, emoji/CJK/combining unicode, a 100 KB
single token, NUL bytes, a BOM-prefixed row. The byte-kernel
trailing-empty-row bug (fixed round 5) was exactly this class: green
oracles at sf0.01 while ["a.b.", ""] miscounted. Stages must neither
crash nor produce out-of-contract values on any of these rows.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

TEXTS = [
    "",
    " ",
    "\n\n",
    "\t",
    "normal text here",
    "🎉🎉 emoji soup 🌍",
    "中文文本测试一二三",
    "combining é́",
    "a" * 100_000,
    ("tok " * 5000).strip(),
    "ß ÿ à mixed ÀÉÎ",
    "1234567890 !!!",
    "\x00null byte",
    "﻿BOM start",
    # 60-token identical twins: with hash%4 window sampling, ≥1 of the
    # 51 10-token windows samples with probability 1 - (3/4)^51
    " ".join(f"w{i % 7}x{i}" for i in range(60)),
    " ".join(f"w{i % 7}x{i}" for i in range(60)),
]


@pytest.fixture()
def adversarial_docs(ray_session):
    n = len(TEXTS)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(TEXTS, pa.string()),
        "lang": pa.array(["xx"] * n),
        "source": pa.array(["fuzz"] * n),
        "n_chars": pa.array([len(t) for t in TEXTS], pa.int64()),
    }))


def test_text_stats_family(adversarial_docs):
    from beats_ray.dataops import textstats

    ts = textstats.token_stats(adversarial_docs).to_pandas().set_index(
        "doc_id").sort_index()
    assert len(ts) == len(TEXTS)
    # empty/whitespace rows count zero tokens; the 100 KB token counts 1
    assert ts.loc[0, "n_ws_tokens"] == 0
    assert ts.loc[1, "n_ws_tokens"] == 0
    assert ts.loc[8, "n_ws_tokens"] == 1
    assert ts.loc[9, "n_ws_tokens"] == 5000
    li = textstats.lang_id(adversarial_docs).to_pandas()
    assert len(li) == len(TEXTS)
    q = textstats.quality_score(adversarial_docs).to_pandas()
    assert len(q) == len(TEXTS)
    fp = textstats.doc_fingerprint(adversarial_docs).to_pandas()
    assert fp["doc_id"].nunique() == len(TEXTS)


def test_pii_and_norm_family(adversarial_docs):
    from beats_ray.dataops import pii, textnorm

    masked = pii.mask_pii(adversarial_docs).to_pandas()
    assert len(masked) == len(TEXTS)
    tw = pii.top_words(adversarial_docs)
    tw = tw.to_pandas() if hasattr(tw, "to_pandas") else tw
    assert (tw["n"] > 0).all()
    nn = textnorm.normalize_text(adversarial_docs).to_pandas()
    assert len(nn) == len(TEXTS)
    rep = textnorm.repetition_score(adversarial_docs).to_pandas()
    assert len(rep) == len(TEXTS)
    cs = textnorm.contamination_screen(
        adversarial_docs, ["dup dup dup one two"], k=3
    ).to_pandas()
    assert len(cs) == len(TEXTS)


def test_dedup_family(adversarial_docs):
    from beats_ray.dataops import dedup

    kept = dedup.exact_dedup(adversarial_docs).to_pandas()
    # rows 14/15 are byte-identical → exactly one survives
    assert len(kept) == len(TEXTS) - 1
    md = dedup.minhash_dedup(adversarial_docs)
    md = md.to_pandas() if hasattr(md, "to_pandas") else md
    assert len(md) <= len(TEXTS)
    sh = dedup.simhash_dedup(adversarial_docs)
    sh = sh.to_pandas() if hasattr(sh, "to_pandas") else sh
    ws = dedup.window_dup_spans(adversarial_docs)
    ws = ws.to_pandas() if hasattr(ws, "to_pandas") else ws
    # the identical 12-token twins share every sampled window
    assert set(ws["doc_id"]) >= {14, 15}


def test_sampling_and_quality_family(adversarial_docs):
    from beats_ray.dataops import quality, sampling

    s = sampling.hash_sample(adversarial_docs, 0.5).to_pandas()
    assert 0 <= len(s) <= len(TEXTS)
    sp = sampling.hash_split(
        adversarial_docs, {"train": 0.8, "val": 0.2}
    ).to_pandas()
    assert len(sp) == len(TEXTS)
    assert set(sp["split"]) <= {"train", "val"}
    pk = sampling.pack_sequences(adversarial_docs, 64)
    pk = pk.to_pandas() if hasattr(pk, "to_pandas") else pk
    c4 = quality.c4_line_filter(adversarial_docs).to_pandas()
    assert len(c4) == len(TEXTS)
    bc = quality.bigram_coverage(adversarial_docs).to_pandas()
    assert len(bc) == len(TEXTS)
    assert (bc["n_in_model"] <= bc["n_bigrams"]).all()
    assert (bc["n_in_model"] >= 0).all()


def test_boilerplate_lines_adversarial(adversarial_docs):
    """Both apply paths over the fuzz corpus: unicode/NUL/BOM/100KB
    lines survive; identical twin rows' lines are NOT boilerplate at
    min_docs=3 (only 2 docs); at min_docs=2 they vanish from both."""
    from beats_ray.dataops.textnorm import remove_boilerplate_lines

    for limit in (100, 0):  # broadcast path, then distributed path
        out = remove_boilerplate_lines(
            adversarial_docs, keys=("doc_id",), id_col="doc_id",
            min_docs=3, broadcast_limit=limit,
        ).to_pandas().set_index("doc_id").sort_index()
        assert len(out) == len(TEXTS)
        assert out["n_removed"].sum() == 0  # nothing repeats across >=3 docs
        assert out.loc[4, "clean_text"] == "normal text here"
        assert out.loc[2, "clean_text"] == "\n\n"  # blanks untouched
    twin = " ".join(f"w{i % 7}x{i}" for i in range(60))
    out2 = remove_boilerplate_lines(
        adversarial_docs, keys=("doc_id",), id_col="doc_id", min_docs=2,
    ).to_pandas().set_index("doc_id").sort_index()
    assert out2.loc[14, "clean_text"] == "" and out2.loc[14, "n_removed"] == 1
    assert out2.loc[15, "clean_text"] == "" and out2.loc[15, "n_removed"] == 1
    assert twin not in set(out2["clean_text"])


def test_lexical_diversity_adversarial(adversarial_docs):
    from beats_ray.dataops.textnorm import lexical_diversity

    out = lexical_diversity(adversarial_docs).to_pandas().set_index(
        "doc_id").sort_index()
    assert len(out) == len(TEXTS)
    assert (out["n_distinct"] <= out["n_words"]).all()
    assert (out["n_hapax"] <= out["n_distinct"]).all()
    assert out.loc[0, "n_words"] == 0 and out.loc[0, "n_distinct"] == 0
    assert out.loc[8, "n_words"] == 1 and out.loc[8, "n_hapax"] == 1
    # "tok " * 5000 → 5000 words, 1 distinct, 0 hapax
    assert out.loc[9, "n_words"] == 5000
    assert out.loc[9, "n_distinct"] == 1 and out.loc[9, "n_hapax"] == 0


def test_lm_family(adversarial_docs):
    """Unigram/bigram NLL, DSIR, NB, and the CCNet bucketer over the
    hostile corpus: zero-token rows score the documented zeros, no
    stage crashes on NULs / BOMs / 100 KB tokens."""
    from beats_ray.dataops import lm

    nll = lm.unigram_nll(adversarial_docs, model_k=50).to_pandas(
        ).set_index("doc_id").sort_index()
    assert len(nll) == len(TEXTS)
    assert (nll.loc[[0, 1, 2, 3],
                    ["n_tokens", "nll_sum", "avg_nll"]] == 0).all().all()

    bg = lm.bigram_nll(adversarial_docs, model_k=50, bigram_k=100
                       ).to_pandas().set_index("doc_id").sort_index()
    assert len(bg) == len(TEXTS)
    # single-token docs (the 100 KB token) have zero bigrams
    assert bg.loc[8, "n_bigrams"] == 0 and bg.loc[8, "nll2_sum"] == 0
    assert bg.loc[9, "n_bigrams"] == 4999

    ds = lm.dsir_weights(adversarial_docs, target_col="lang",
                         target_value="xx").to_pandas()
    assert len(ds) == len(TEXTS)

    nb = lm.nb_classify(adversarial_docs, label_col="lang",
                        positive_value="xx", model_k=50).to_pandas(
        ).set_index("doc_id")
    assert len(nb) == len(TEXTS)
    assert set(nb["pred"].unique()) <= {0, 1}

    cc = lm.ccnet_ppl_buckets(adversarial_docs, model_k=50).to_pandas(
        ).set_index("doc_id").sort_index()
    assert len(cc) == len(TEXTS)
    assert set(cc.loc[[0, 1, 2, 3], "bucket"]) == {"empty"}
    assert set(cc["bucket"]) <= {"head", "middle", "tail", "empty"}
