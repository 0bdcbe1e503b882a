"""Training driver: jit'd train step per bucket, GSPMD distribution,
checkpoint/resume, JSONL metrics (SURVEY.md §2 L5 equivalent).

One XLA program per bucket shape (recompile guard: tests/test_recompile.py);
each program fuses frontend -> (SpecAugment) -> encoder -> CTC loss -> Adam
update on device.  Distribution is pure GSPMD: batch rows shard over the
'data' mesh axis, params follow their flax logical annotations
(parallel/mesh.py); the gradient psum is inserted by XLA, not by us.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .augment import specaugment
from .configs import TrainConfig
from .ctc.loss import ctc_loss
from .data import BucketedLoader, SyntheticCorpus, Batch
from .data.buckets import default_buckets
from .features import make_frontend, num_frames
from .models.encoder import CTCModel
from .ops import runtime
from .parallel.mesh import (
    make_mesh,
    data_sharding,
    shard_params_by_rules,
)


def make_corpus(cfg: TrainConfig, eval_split: bool = False):
    if cfg.corpus == "synthetic":
        if eval_split:
            n = cfg.eval_utts or max(cfg.num_utterances // 8, 16)
        else:
            n = cfg.num_utterances
        # Disjoint seeds => disjoint utterances for train/eval.  The eval
        # split optionally applies the harder protocol (unseen formant
        # shift + raised noise floor) so WER has measurable headroom.
        corpus = SyntheticCorpus(
            n,
            seed=cfg.seed + (1000 if eval_split else 0),
            char_dur_ms=cfg.synth_char_ms,
            noise_level=(
                cfg.eval_noise_level
                if eval_split and cfg.eval_noise_level is not None
                else 0.05
            ),
            formant_shift_hz=cfg.eval_formant_shift_hz if eval_split else 0.0,
        )
        return _maybe_cache(cfg, corpus, "eval" if eval_split else "train")
    from .data.librispeech import LibriSpeechCorpus

    split = "test-clean" if eval_split else cfg.corpus_split
    return LibriSpeechCorpus(cfg.corpus, split)


def _maybe_cache(cfg: TrainConfig, corpus, tag: str):
    """Pack a large synthetic corpus to int16 shards once; mmap thereafter.

    Epoch loops over SyntheticCorpus re-synthesize every formant burst on
    the host (VERDICT.md round-1 weak #4); the packed cache makes waveform()
    an mmap slice.  int16 is lossless for the training path (the loader
    rounds to int16 wire format anyway).  Writes go to a tmp dir renamed
    atomically, so concurrent processes race benignly.
    """
    if not cfg.cache_dir:
        return corpus
    if cfg.cache_dir == "auto" and len(corpus) < 2048:
        return corpus
    import os

    from .data.prepare import PackedCorpus, write_shards

    root = _default_cache_root() if cfg.cache_dir == "auto" else cfg.cache_dir
    # _v2: synthesis-format version — bump whenever SyntheticCorpus's
    # waveform generation changes, or old cache dirs silently serve stale
    # audio under an identical parameter key.  The key folds in EVERY
    # synthesis parameter (incl. word-count bounds, spacing, sample rate):
    # any future configurability must miss the cache, not alias it.
    key = (
        f"{tag}_v2_n{len(corpus)}_seed{corpus.seed}_cd{int(corpus.char_dur)}"
        f"_nl{corpus.noise_level:g}_fs{corpus.formant_shift_hz:g}"
        f"_sd{int(corpus.space_dur)}_w{corpus.min_words}-{corpus.max_words}"
        f"_sr{corpus.sample_rate}"
    )
    d = os.path.join(root, key)
    if not os.path.exists(os.path.join(d, "manifest.json")):
        tmp = f"{d}.tmp.{os.getpid()}"
        write_shards(corpus, tmp, dtype=np.int16)
        try:
            os.rename(tmp, d)
        except OSError:  # lost the race: another process finished first
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    return PackedCorpus(d)


def _default_cache_root() -> str:
    """Absolute anchor for the 'auto' corpus cache.

    CWD-relative 'runs/_corpus_cache' would silently rebuild (or worse,
    duplicate) caches whenever a tool runs from a different directory
    (ADVICE r2).  Anchor at the checkout root when the package is imported
    from one (the directory above the package holding pyproject.toml),
    else under the user cache dir.
    """
    import os

    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    if os.path.exists(os.path.join(pkg_parent, "pyproject.toml")):
        return os.path.join(pkg_parent, "runs", "_corpus_cache")
    return os.path.join(
        os.path.expanduser("~"), ".cache", "neuralasr_tpu", "corpus"
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.lr,
        warmup_steps=cfg.warmup_steps,
        decay_steps=max(cfg.warmup_steps * 20, 2000),
        end_value=cfg.lr * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )


class Trainer:
    def __init__(
        self,
        cfg: TrainConfig,
        mesh=None,
        process_index: int = 0,
        process_count: int = 1,
        keep_partition_attention: bool = False,
    ):
        """keep_partition_attention: skip the single-device downgrade below
        (bench A/B of the custom_partitioning boundary's cost — ADVICE r2:
        mutating trainer.cfg/model after construction was order-fragile)."""
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(model_axis=cfg.model_axis)
        # Pin the Pallas kernels' Mosaic-vs-interpret decision to the
        # platform of the devices this trainer will actually compile for.
        # default_backend() is wrong in one real case: a TPU-registered
        # process (axon sitecustomize) driving a fake-CPU mesh — there the
        # kernels would pick Mosaic and CPU lowering fails (ops/runtime.py).
        runtime.set_compute_platform(
            next(iter(self.mesh.devices.flat)).platform
        )
        if (
            self.mesh.size == 1
            and cfg.model.partition_attention
            and not keep_partition_attention
        ):
            # One device: partitioning buys nothing and its custom-call
            # boundary can block fusion around the attention kernel.
            cfg = dataclasses.replace(
                cfg,
                model=dataclasses.replace(
                    cfg.model, partition_attention=False
                ),
            )
            self.cfg = cfg
        self.model = CTCModel(cfg.model)
        self.corpus = make_corpus(cfg)
        self.buckets = default_buckets(cfg.batch_size)
        self.loader = BucketedLoader(
            self.corpus,
            self.buckets,
            seed=cfg.seed,
            process_index=process_index,
            process_count=process_count,
        )
        self.optimizer = make_optimizer(cfg)
        self._step_fns: dict[int, callable] = {}
        self._frontends: dict[int, callable] = {}
        # Compiled eval programs, keyed per bucket/beam geometry — owned by
        # the Trainer so repeated evaluate_corpus calls (--eval-every, the
        # WER ladder) re-trace nothing (VERDICT r2 item 8).
        self.eval_fwd_fns: dict[tuple, callable] = {}
        self.eval_beam_fns: dict[tuple, callable] = {}

        # Init params on a representative (smallest-bucket) shape.
        b0 = self.buckets[0]
        Tmax = int(num_frames(b0.max_samples))
        feats_shape = (1, Tmax, cfg.features.dim)
        rng = jax.random.PRNGKey(cfg.seed)
        params = self.model.init(
            rng,
            jnp.zeros(feats_shape, jnp.float32),
            jnp.asarray([Tmax], jnp.int32),
        )["params"]
        self.param_shardings = shard_params_by_rules(self.mesh, params)
        params = jax.device_put(params, self.param_shardings)
        # Eager init lets mu/nu inherit the params' NamedShardings
        # (zeros_like on committed arrays); scalars (adam count) come out as
        # uncommitted single-device arrays.  Re-home those to a replicated
        # NamedSharding on the mesh and COMMIT every leaf — uncommitted
        # leaves flip their commit bit after step 1, changing the executable
        # cache key and silently compiling every bucket program twice
        # (tests/test_recompile.py); single-device scalars break multi-device
        # meshes outright.
        opt_state = self.optimizer.init(params)
        repl = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )
        opt_state = jax.tree.map(
            lambda x: jax.device_put(
                x,
                x.sharding
                if isinstance(x.sharding, jax.sharding.NamedSharding)
                else repl,
            ),
            opt_state,
        )
        self.state = {"params": params, "opt_state": opt_state}
        self.step = 0
        self.data_sharding = data_sharding(self.mesh)

    # ---------------- per-bucket compiled steps ----------------

    def _frontend_for(self, bucket: int):
        if bucket not in self._frontends:
            spec = self.buckets[bucket]
            self._frontends[bucket] = make_frontend(
                self.cfg.features, int(num_frames(spec.max_samples))
            )
        return self._frontends[bucket]

    def _loss_fn(
        self, params, rng, feats, feat_lens, labels, label_lens, weights
    ):
        rngs = {"dropout": rng} if self.cfg.model.dropout > 0 else None
        logits, out_lens = self.model.apply(
            {"params": params}, feats, feat_lens, train=True, rngs=rngs
        )
        per = ctc_loss(
            logits, labels, out_lens, label_lens, impl=self.cfg.ctc_impl
        )
        # Infeasible rows (out_len < label_len after subsampling) and
        # tail-padding duplicates carry zero weight.
        feasible = (out_lens >= label_lens).astype(jnp.float32)
        w = weights * feasible
        per = jnp.where(per > 1e29, 0.0, per)
        loss = (per * w).sum() / jnp.maximum(w.sum(), 1.0)
        return loss, (per, w)

    def _make_step(self, bucket: int):
        frontend = self._frontend_for(bucket)
        cfg = self.cfg
        # Pin output shardings to the live state's: without this the first
        # call (device_put inputs) and later calls (jit outputs) disagree on
        # sharding and every bucket compiles twice (tests/test_recompile.py).
        state_sh = jax.tree.map(lambda x: x.sharding, self.state)
        scalar_sh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()
        )

        @partial(
            jax.jit,
            donate_argnums=(0,),
            out_shardings=(state_sh, scalar_sh, scalar_sh),
        )
        def train_step(state, rng, wav, wav_lens, labels, label_lens, weights):
            rng_sa, rng_do = jax.random.split(rng)
            feats, feat_lens = frontend(wav, wav_lens)
            if cfg.specaugment:
                feats = specaugment(
                    rng_sa,
                    feats,
                    feat_lens,
                    freq_mask=cfg.freq_mask,
                    time_mask=cfg.time_mask,
                    num_freq_masks=cfg.num_freq_masks,
                    num_time_masks=cfg.num_time_masks,
                    time_mask_noise=cfg.time_mask_noise,
                )
            (loss, _aux), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(
                state["params"], rng_do, feats, feat_lens, labels,
                label_lens, weights,
            )
            gnorm = optax.global_norm(grads)
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            return {"params": params, "opt_state": opt_state}, loss, gnorm

        return train_step

    def _step_for(self, bucket: int):
        if bucket not in self._step_fns:
            self._step_fns[bucket] = self._make_step(bucket)
        return self._step_fns[bucket]

    def put_batch(self, batch: Batch, loader=None):
        """Host arrays -> device arrays sharded over the 'data' axis.

        Single-process: plain async device_put.  Multi-process
        (jax.process_count() > 1): each process materialized only its
        contiguous row block (data/loader.py row-slice protocol);
        jax.make_array_from_process_local_data assembles the global array
        from the per-process blocks with zero cross-host traffic — the
        blocks already sit where NamedSharding(P('data')) wants them.
        """
        loader = loader if loader is not None else self.loader
        data_size = self.mesh.shape["data"]
        if batch.wav.shape[0] % data_size != 0:
            raise ValueError(
                f"batch of {batch.wav.shape[0]} rows cannot shard over "
                f"data axis of size {data_size}; size bucket batch sizes "
                "as multiples of the data-parallel degree "
                "(data/buckets.py halves batch size down the ladder — "
                "raise the config batch_size or shrink the mesh)"
            )
        if jax.process_count() > 1:
            assert loader.process_count == jax.process_count(), (
                "loader built for a different process topology: "
                f"{loader.process_count} != {jax.process_count()}"
            )
            rows = loader.local_rows(batch)

            def put(x):
                return jax.make_array_from_process_local_data(
                    self.data_sharding,
                    np.ascontiguousarray(x[rows]),
                    x.shape,
                )

        else:
            put = lambda x: jax.device_put(x, self.data_sharding)
        return (
            put(batch.wav),
            put(batch.wav_lens),
            put(batch.labels),
            put(batch.label_lens),
            put(batch.weights),
        )

    def train_batch(self, batch: Batch) -> dict:
        """One async-dispatched step.  'loss'/'grad_norm' are DEVICE scalars —
        convert with float() only when logging (a float() per step forces a
        device round-trip that serializes the pipeline; callers should sync
        every log_every steps, letting transfers overlap compute)."""
        step_fn = self._step_for(batch.bucket)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 17), self.step)
        args = self.put_batch(batch)
        self.state, loss, gnorm = step_fn(self.state, rng, *args)
        self.step += 1
        return {
            "loss": loss,
            "grad_norm": gnorm,
            "audio_s": self.batch_audio_s(batch),
        }

    def batch_audio_s(self, batch: Batch) -> float:
        """Global audio seconds in a batch.  Multi-process loaders fill
        wav_lens only for this process's row block (rows outside stay 0),
        so the local sum under-reports by ~process_count (ADVICE r2);
        blocks are equal-sized, so scaling recovers the global figure."""
        local = float(batch.wav_lens.sum()) / self.cfg.features.sample_rate
        return local * self.loader.process_count

    def train_batch_device(self, bucket: int, device_args: tuple):
        """Step on already-device-resident args (bench/steady-state path)."""
        step_fn = self._step_for(bucket)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.cfg.seed + 17), self.step)
        self.state, loss, gnorm = step_fn(self.state, rng, *device_args)
        self.step += 1
        return loss, gnorm

    # ---------------- evaluation ----------------

    def greedy_wer(self, corpus, max_utts: int = 128) -> float:
        """Greedy-decode WER on the first max_utts of a corpus.

        Multi-host aware: delegates to evaluation.evaluate_corpus (sharded
        decode under the mesh + eval all-gather, SURVEY.md §6)."""
        from .evaluation import evaluate_corpus

        return evaluate_corpus(self, corpus, max_utts=max_utts).greedy_wer


