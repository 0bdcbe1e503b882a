"""Numeric-parity gate for the CTC loss (BASELINE.json north-star oracle
surface): ours vs the numpy oracle, vs tf.nn.ctc_loss, and vs numerical
gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neuralasr_tpu.ctc.loss import ctc_loss, ctc_forward
from neuralasr_tpu.reference import ctc_oracle


def _rand_case(rng, T, L, V=8):
    logits = rng.normal(size=(T, V)).astype(np.float32) * 2.0
    labels = rng.integers(1, V, size=(L,)).astype(np.int32)
    return logits, labels


def _batch_from_cases(cases, Tmax, Lmax, V):
    B = len(cases)
    logits = np.zeros((B, Tmax, V), dtype=np.float32)
    labels = np.zeros((B, Lmax), dtype=np.int32)
    in_lens = np.zeros((B,), dtype=np.int32)
    lab_lens = np.zeros((B,), dtype=np.int32)
    for i, (lg, lb) in enumerate(cases):
        T, L = lg.shape[0], len(lb)
        logits[i, :T] = lg
        # Poison the padding to prove masking works.
        logits[i, T:] = 7.7
        labels[i, :L] = lb
        in_lens[i] = T
        lab_lens[i] = L
    return logits, labels, in_lens, lab_lens


def test_loss_matches_oracle_batch():
    rng = np.random.default_rng(0)
    V = 8
    cases = [
        _rand_case(rng, 20, 5, V),
        _rand_case(rng, 12, 12, V),  # T == L (tightest feasible)
        _rand_case(rng, 17, 0, V),  # empty label
        _rand_case(rng, 30, 7, V),
    ]
    # Force repeated labels in one case.
    cases[3] = (cases[3][0], np.array([2, 2, 3, 3, 3, 5, 2], dtype=np.int32))
    logits, labels, in_lens, lab_lens = _batch_from_cases(cases, 32, 16, V)

    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(in_lens), jnp.asarray(lab_lens)))
    want = ctc_oracle.ctc_loss_batch(logits, labels, in_lens, lab_lens)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_loss_matches_tf():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    V = 10
    cases = [_rand_case(rng, 25, 6, V), _rand_case(rng, 18, 9, V)]
    logits, labels, in_lens, lab_lens = _batch_from_cases(cases, 25, 9, V)

    ours = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(in_lens), jnp.asarray(lab_lens)))

    # TF convention: blank = last class. Rotate classes so our blank(0) maps
    # to TF's blank(V-1): tf_class v = ours v+1, labels shift down by 1.
    tf_logits = np.concatenate([logits[..., 1:], logits[..., :1]], axis=-1)
    tf_labels = labels - 1
    losses = tf.nn.ctc_loss(
        labels=tf.ragged.boolean_mask(
            tf_labels, np.arange(labels.shape[1])[None, :] < lab_lens[:, None]
        ).to_sparse(),
        logits=tf_logits,
        label_length=None,
        logit_length=in_lens,
        logits_time_major=False,
        blank_index=V - 1,
    ).numpy()
    np.testing.assert_allclose(ours, losses, rtol=1e-4, atol=1e-4)


def test_grad_matches_numerical():
    rng = np.random.default_rng(2)
    V, T, L = 5, 7, 3
    logits, labels = _rand_case(rng, T, L, V)
    lg, lb, il, ll = _batch_from_cases([(logits, labels)], T, L, V)

    f = lambda x: ctc_loss(x, jnp.asarray(lb), jnp.asarray(il),
                           jnp.asarray(ll)).sum()
    g = np.asarray(jax.grad(f)(jnp.asarray(lg)))[0]
    g_num = ctc_oracle.ctc_grad_single(logits.astype(np.float64), labels, T)
    np.testing.assert_allclose(g, g_num, rtol=1e-3, atol=1e-3)


def test_infeasible_returns_huge():
    # T < L: no alignment exists.
    logits = jnp.zeros((1, 3, 5))
    labels = jnp.asarray([[1, 2, 3, 4]], dtype=jnp.int32)
    loss = ctc_loss(logits, labels, jnp.asarray([3]), jnp.asarray([4]))
    assert float(loss[0]) > 1e29


def test_padding_invariance():
    # Extending T/L padding must not change the loss.
    rng = np.random.default_rng(3)
    V = 6
    lg, lb = _rand_case(rng, 14, 4, V)
    a = _batch_from_cases([(lg, lb)], 14, 4, V)
    b = _batch_from_cases([(lg, lb)], 40, 11, V)
    la = ctc_loss(*(jnp.asarray(x) for x in a))
    lb_ = ctc_loss(*(jnp.asarray(x) for x in b))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb_), rtol=1e-5)


def test_forward_is_jittable_no_recompile():
    calls = 0

    @jax.jit
    def f(lg, lb, il, ll):
        nonlocal calls
        calls += 1
        return ctc_loss(lg, lb, il, ll)

    rng = np.random.default_rng(4)
    for seed in range(3):
        lg = jnp.asarray(rng.normal(size=(2, 10, 6)).astype(np.float32))
        lb = jnp.asarray(rng.integers(1, 6, size=(2, 4)).astype(np.int32))
        f(lg, lb, jnp.asarray([10, 8]), jnp.asarray([4, 2])).block_until_ready()
    assert calls == 1  # traced once for a fixed shape


def test_fb_grad_matches_autodiff():
    # Hand-written alpha-beta backward vs autodiff-through-scan, batched
    # with mixed lengths (incl. empty label and repeated labels).
    rng = np.random.default_rng(7)
    V = 8
    cases = [
        _rand_case(rng, 20, 5, V),
        _rand_case(rng, 12, 12, V),
        _rand_case(rng, 17, 0, V),
    ]
    cases.append((rng.normal(size=(30, V)).astype(np.float32),
                  np.array([2, 2, 3, 3, 3, 5, 2], dtype=np.int32)))
    logits, labels, in_lens, lab_lens = _batch_from_cases(cases, 32, 16, V)
    lg = jnp.asarray(logits)
    lb, il, ll = (jnp.asarray(x) for x in (labels, in_lens, lab_lens))

    def loss_fb(x):
        return ctc_loss(x, lb, il, ll, grad="fb").sum()

    def loss_ad(x):
        return ctc_loss(x, lb, il, ll, grad="autodiff").sum()

    np.testing.assert_allclose(loss_fb(lg), loss_ad(lg), rtol=1e-5)
    g_fb = np.asarray(jax.grad(loss_fb)(lg))
    g_ad = np.asarray(jax.grad(loss_ad)(lg))
    np.testing.assert_allclose(g_fb, g_ad, rtol=1e-3, atol=1e-4)


def test_fb_grad_matches_numerical():
    rng = np.random.default_rng(8)
    V, T, L = 5, 7, 3
    logits, labels = _rand_case(rng, T, L, V)
    lg, lb, il, ll = _batch_from_cases([(logits, labels)], T, L, V)
    f = lambda x: ctc_loss(x, jnp.asarray(lb), jnp.asarray(il),
                           jnp.asarray(ll), grad="fb").sum()
    g = np.asarray(jax.grad(f)(jnp.asarray(lg)))[0]
    g_num = ctc_oracle.ctc_grad_single(logits.astype(np.float64), labels, T)
    np.testing.assert_allclose(g, g_num, rtol=1e-3, atol=1e-3)


def test_checked_ctc_loss_flags_bad_lengths():
    from neuralasr_tpu.ctc.loss import checked_ctc_loss

    rng = np.random.default_rng(11)
    B, T, V, L = 2, 12, 7, 4
    logits = jnp.asarray(rng.normal(size=(B, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, size=(B, L)).astype(np.int32))
    good = checked_ctc_loss(
        logits, labels, jnp.asarray([12, 10]), jnp.asarray([4, 3])
    )
    err, loss = good
    err.throw()  # no violation
    assert np.all(np.isfinite(np.asarray(loss)))

    err, _ = checked_ctc_loss(
        logits, labels, jnp.asarray([13, 10]), jnp.asarray([4, 3])
    )
    with pytest.raises(Exception, match="input_lens"):
        err.throw()

    err, _ = checked_ctc_loss(
        logits, labels.at[0, 0].set(V), jnp.asarray([12, 10]),
        jnp.asarray([4, 3])
    )
    with pytest.raises(Exception, match="vocab"):
        err.throw()
