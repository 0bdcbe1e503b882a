"""Decoder parity: greedy and beam search vs the host-python oracles and
(for beam) tf.nn.ctc_beam_search_decoder."""

import numpy as np
import jax.numpy as jnp
import pytest

from neuralasr_tpu.ctc.greedy import greedy_decode
from neuralasr_tpu.ctc.beam import beam_search_decode
from neuralasr_tpu.reference import ctc_oracle, beam_oracle


def test_greedy_matches_oracle():
    rng = np.random.default_rng(0)
    B, T, V = 5, 30, 9
    logits = rng.normal(size=(B, T, V)).astype(np.float32) * 3
    lens = np.array([30, 17, 1, 30, 8], dtype=np.int32)
    ids, out_lens = greedy_decode(jnp.asarray(logits), jnp.asarray(lens))
    ids, out_lens = np.asarray(ids), np.asarray(out_lens)
    for b in range(B):
        want = ctc_oracle.greedy_decode_single(logits[b], lens[b])
        got = list(ids[b, : out_lens[b]])
        assert got == want, (b, got, want)


def _check_beam_case(logits, T, W=8, lm_fn=None, lm_weight=0.0,
                     lm_score=None, k=4):
    got_p, got_l, got_s = beam_search_decode(
        jnp.asarray(logits[None]), jnp.asarray([T]), beam_width=W,
        max_label_len=T + 1, lm_fn=lm_fn, lm_weight=lm_weight,
    )
    got_p, got_l, got_s = (np.asarray(x)[0] for x in (got_p, got_l, got_s))
    want = beam_oracle.beam_search_single(
        logits, T, beam_width=W, prune_logp=-1e9,
        lm_score=lm_score, lm_weight=lm_weight,
    )
    # Compare the top beam exactly and its score closely.
    want_ids, want_score = want[0]
    got_ids = list(got_p[0, : got_l[0]])
    assert got_ids == want_ids, (got_ids, want_ids)
    np.testing.assert_allclose(got_s[0], want_score, rtol=1e-4, atol=1e-4)
    # Top-k beam scores should match the oracle's. Exact score ties make
    # WHICH tied prefix survives pruning arbitrary (and mass then diverges),
    # so tie-heavy cases pass k=1.
    want_scores = np.array([s for _, s in want])
    k = min(len(want_scores), W, k)
    np.testing.assert_allclose(got_s[:k], want_scores[:k], rtol=1e-3,
                               atol=1e-3)


def test_beam_matches_oracle_random():
    rng = np.random.default_rng(1)
    for seed in range(4):
        T, V = 12, 6
        logits = (rng.normal(size=(T, V)) * 2).astype(np.float32)
        _check_beam_case(logits, T)


def test_beam_peaked_logits():
    # Near-deterministic logits: beam must equal greedy path collapse.
    rng = np.random.default_rng(2)
    T, V = 15, 7
    path = rng.integers(0, V, size=T)
    logits = np.full((T, V), -8.0, dtype=np.float32)
    logits[np.arange(T), path] = 8.0
    _check_beam_case(logits, T, k=1)  # flat off-peak mass => exact ties
    want = ctc_oracle.greedy_decode_single(logits, T)
    got_p, got_l, _ = beam_search_decode(
        jnp.asarray(logits[None]), jnp.asarray([T]), beam_width=4,
        max_label_len=T + 1,
    )
    assert list(np.asarray(got_p)[0, 0, : int(got_l[0, 0])]) == want


def test_beam_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(3)
    T, V, W = 10, 5, 8
    logits = (rng.normal(size=(T, V)) * 2).astype(np.float32)

    got_p, got_l, got_s = beam_search_decode(
        jnp.asarray(logits[None]), jnp.asarray([T]), beam_width=W,
        max_label_len=T + 1,
    )
    got_ids = list(np.asarray(got_p)[0, 0, : int(got_l[0, 0])])

    # TF: blank = last class; rotate classes (ours v -> tf v-1).
    tf_logits = np.concatenate([logits[:, 1:], logits[:, :1]], axis=-1)
    decoded, logp = tf.nn.ctc_beam_search_decoder(
        tf.constant(tf_logits[:, None, :]), tf.constant([T]),
        beam_width=W, top_paths=1,
    )
    tf_ids = [int(v) + 1 for v in decoded[0].values.numpy()]
    assert got_ids == tf_ids


def test_merge_impls_agree():
    """Sort-based merge (searchsorted + per-target column fold) must equal
    the all-pairs [W,V,W] match on random logits at widths 16 and 64."""
    rng = np.random.default_rng(21)
    for W in (16, 64):
        for seed in range(3):
            B, T, V = 3, 40, 30
            logits = (rng.normal(size=(B, T, V)) * 2.5).astype(np.float32)
            lens = np.array([40, 23, 7], dtype=np.int32)
            outs = {}
            for impl in ("sort", "allpairs"):
                p, l, s = beam_search_decode(
                    jnp.asarray(logits), jnp.asarray(lens), beam_width=W,
                    max_label_len=T + 1, merge_impl=impl,
                )
                outs[impl] = (np.asarray(p), np.asarray(l), np.asarray(s))
            pa, la, sa = outs["sort"]
            pb, lb, sb = outs["allpairs"]
            np.testing.assert_allclose(sa, sb, rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(la, lb)
            for b in range(B):
                for w in range(W):
                    np.testing.assert_array_equal(
                        pa[b, w, : la[b, w]], pb[b, w, : lb[b, w]]
                    )


def test_beam_long_sequence_matches_oracle():
    """Long-T parity (VERDICT r2 item 5): unit tests previously stopped at
    T<=40 while real utterances decode at T~900 — drive the on-device beam
    against the host oracle at realistic length and vocab."""
    rng = np.random.default_rng(22)
    T, V, W = 900, 30, 16
    # Speech-like emissions: mostly confident blanks with character bursts.
    logits = rng.normal(size=(T, V)).astype(np.float32)
    logits[:, 0] += 4.0  # blank-dominated
    burst_t = rng.choice(T, size=60, replace=False)
    burst_c = rng.integers(1, V, size=60)
    logits[burst_t, burst_c] += 9.0
    _check_beam_case(logits, T, W=W, k=4)


def test_beam_respects_input_lens():
    rng = np.random.default_rng(4)
    T, V = 20, 6
    logits = (rng.normal(size=(T, V)) * 2).astype(np.float32)
    # Poison the tail; decode with len 12 must ignore it.
    poisoned = logits.copy()
    poisoned[12:] = 9.0
    a = beam_search_decode(jnp.asarray(logits[None, :12]),
                           jnp.asarray([12]), beam_width=4,
                           max_label_len=16)
    b = beam_search_decode(jnp.asarray(poisoned[None]), jnp.asarray([12]),
                           beam_width=4, max_label_len=16)
    np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]), rtol=1e-5)
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_beam_lm_fusion_matches_oracle():
    from neuralasr_tpu.ctc.lm_fusion import NGramLM
    from neuralasr_tpu.text import VOCAB_SIZE

    lm = NGramLM.train(["abba cab", "bac abba", "cabbage abs"], order=2)
    lm_fn = lm.score_fn()
    table = np.asarray(lm.table, dtype=np.float64)

    def lm_score(prefix, c):
        ctx = prefix[-1] if prefix else 0
        return table[ctx, c]

    rng = np.random.default_rng(5)
    T, V = 10, VOCAB_SIZE
    logits = (rng.normal(size=(T, V)) * 2).astype(np.float32)
    _check_beam_case(logits, T, W=8, lm_fn=lm_fn, lm_weight=0.5,
                     lm_score=lm_score)


def test_blank_collapse_preserves_decode():
    from neuralasr_tpu.ctc.beam import blank_collapse
    import jax

    # Emissions: sparse non-blank peaks in a sea of confident blanks —
    # the typical CTC posterior shape the compression targets.
    rng = np.random.default_rng(6)
    T, V = 40, 8
    logits = np.full((T, V), 0.0, dtype=np.float32)
    logits[:, 0] = 6.0  # confident blank everywhere...
    peaks = [3, 9, 15, 22, 30]
    for i, t in enumerate(peaks):
        logits[t] = 0.0
        logits[t, 1 + (i % (V - 1))] = 6.0  # ...except sparse label peaks
    lp = jax.nn.log_softmax(jnp.asarray(logits[None]), axis=-1)
    lens = jnp.asarray([T])

    lp_c, new_lens = blank_collapse(lp, lens, threshold=0.9)
    assert int(new_lens[0]) < T // 2  # real compression

    full = beam_search_decode(lp, lens, beam_width=4, max_label_len=T)
    comp = beam_search_decode(lp_c, new_lens, beam_width=4, max_label_len=T)
    top_full = list(np.asarray(full[0])[0, 0, : int(full[1][0, 0])])
    top_comp = list(np.asarray(comp[0])[0, 0, : int(comp[1][0, 0])])
    assert top_full == top_comp
    # And it matches greedy on these peaked emissions.
    from neuralasr_tpu.reference import ctc_oracle

    assert top_full == ctc_oracle.greedy_decode_single(logits, T)


def test_blank_collapse_respects_lens():
    from neuralasr_tpu.ctc.beam import blank_collapse
    import jax

    rng = np.random.default_rng(7)
    logits = rng.normal(size=(1, 20, 5)).astype(np.float32)
    logits[0, 12:] = 50.0  # poison past length (non-blank! would be kept)
    lp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    _, new_lens = blank_collapse(lp, jnp.asarray([12]), threshold=0.5)
    assert int(new_lens[0]) <= 12


def test_beam_prune_k_exact_vs_full():
    """Per-frame top-K pre-prune (prune_k) must reproduce the full-V beam
    exactly at K >= W+2 without LM — prefixes, lens, AND scores — on both
    random and peaked emissions (VERDICT r3 item 8)."""
    rng = np.random.default_rng(11)
    for seed, peaked in ((0, False), (1, True)):
        r = np.random.default_rng(seed)
        B, T, V, W = 3, 60, 29, 8
        logits = r.normal(size=(B, T, V)).astype(np.float32)
        if peaked:
            hot = r.integers(0, V, size=(B, T))
            for b in range(B):
                logits[b, np.arange(T), hot[b]] += 6.0
        lens = jnp.asarray([60, 41, 7], jnp.int32)
        lg = jnp.asarray(logits)
        fp, fl, fs = beam_search_decode(
            lg, lens, beam_width=W, max_label_len=64
        )
        pp, plen, ps = beam_search_decode(
            lg, lens, beam_width=W, max_label_len=64, prune_k=-1
        )
        np.testing.assert_array_equal(np.asarray(fl), np.asarray(plen))
        np.testing.assert_allclose(
            np.asarray(fs), np.asarray(ps), rtol=1e-5, atol=1e-5
        )
        # Compare prefixes up to each beam's length.
        fln = np.asarray(fl)
        for b in range(B):
            for w in range(W):
                np.testing.assert_array_equal(
                    np.asarray(fp)[b, w, : fln[b, w]],
                    np.asarray(pp)[b, w, : fln[b, w]],
                )


def test_blank_collapse_cli_resolution():
    """Preset-default plumbing (cli/evaluate.py): --no-blank-collapse beats
    an explicit threshold, which beats the preset's eval_blank_collapse."""
    from neuralasr_tpu.cli.evaluate import resolve_blank_collapse

    assert resolve_blank_collapse(None, False, None) is None
    assert resolve_blank_collapse(None, False, 0.999) == 0.999
    assert resolve_blank_collapse(0.95, False, 0.999) == 0.95
    assert resolve_blank_collapse(0.95, True, 0.999) is None
    assert resolve_blank_collapse(None, True, 0.999) is None
