"""Verification drive: end-to-end through the public neuralasr_tpu API."""
import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

import dataclasses
from neuralasr_tpu.configs import CONFIG1
from neuralasr_tpu.training import Trainer, make_corpus

cfg = dataclasses.replace(CONFIG1, num_utterances=32, batch_size=8, epochs=3, lr=3e-3, warmup_steps=5)
print("== config:", cfg.name, "corpus:", cfg.corpus)
t0 = time.time()
tr = Trainer(cfg)
print(f"== trainer init ({time.time()-t0:.1f}s), params:",
      sum(x.size for x in jax.tree.leaves(tr.state["params"])))

# Overfit a single fixed batch: the end-to-end learning signal.
batch = next(iter(tr.loader.epoch(0)))
losses = []
for i in range(60):
    m = tr.train_batch(batch)
    losses.append(m["loss"])
print(f"== trained {tr.step} steps on one batch ({time.time()-t0:.1f}s)")
print("loss trajectory:", [round(losses[i],2) for i in (0,5,10,20,40,59)])
assert losses[-1] < 0.25 * losses[0], f"did not overfit: {losses[0]} -> {losses[-1]}"

w = tr.greedy_wer(tr.corpus, max_utts=16)
print("== train-set greedy WER after 3 epochs:", round(w, 3))

# Decode one utterance with beam search through the public API.
import jax.numpy as jnp
from neuralasr_tpu.ctc import beam_search_decode
from neuralasr_tpu.text import decode as ids_to_text
from neuralasr_tpu.features import make_frontend, num_frames

from neuralasr_tpu.data.buckets import bucket_for
from neuralasr_tpu.text import encode
wav, ref = tr.corpus[0]
bidx = bucket_for(tr.buckets, len(wav), len(encode(ref)))
spec = tr.buckets[bidx]
fe = tr._frontend_for(bidx)
pad = np.zeros((1, spec.max_samples), np.float32); pad[0, :len(wav)] = wav
feats, flens = fe(jnp.asarray(pad), jnp.asarray([len(wav)]))
logits, olens = tr.model.apply({"params": tr.state["params"]}, feats, flens)
p, l, s = beam_search_decode(logits, olens, beam_width=4, max_label_len=64)
hyp = ids_to_text(np.asarray(p)[0, 0, :int(l[0,0])])
print("== ref:", repr(ref))
print("== hyp:", repr(hyp))

# PROBE 1: zero-length label utterance through the loss path.
from neuralasr_tpu.ctc import ctc_loss
lg = jnp.zeros((1, 10, 29))
out = ctc_loss(lg, jnp.zeros((1, 4), jnp.int32), jnp.asarray([10]), jnp.asarray([0]))
print("== probe empty-label ctc_loss:", float(out[0]), "(finite:", bool(np.isfinite(out[0])), ")")

# PROBE 2: batch size not divisible by process_count -> loud error?
from neuralasr_tpu.data import BucketedLoader, SyntheticCorpus
from neuralasr_tpu.data.buckets import default_buckets
try:
    bl = BucketedLoader(SyntheticCorpus(8, seed=1), default_buckets(3), process_index=0, process_count=2)
    next(iter(bl.epoch(0)))
    print("== probe indivisible batch: NO ERROR (unexpected)")
except ValueError as e:
    print("== probe indivisible batch: ValueError:", e)

# PROBE 3: checkpoint save/restore round trip.
from neuralasr_tpu.utils.checkpoint import Checkpointer, abstract_like
import tempfile, shutil
d = tempfile.mkdtemp()
ck = Checkpointer(d)
ck.save(tr.step, tr.state, {"epoch": 2, "batch_index": 0, "config": cfg.name})
st2, meta = ck.restore(abstract_like(tr.state))
same = jax.tree.all(jax.tree.map(lambda a,b: bool(jnp.allclose(a,b)), tr.state["params"], st2["params"]))
print("== probe checkpoint roundtrip: params equal:", same, "meta:", meta)
ck.close(); shutil.rmtree(d)

# PROBE 4: the evaluate.py CLI end-to-end (restore --step from a workdir,
# greedy decode, WER JSON line).
wd = tempfile.mkdtemp()
ck2 = Checkpointer(os.path.join(wd, "ckpt"))
ck2.save(tr.step, tr.state,
         {"step": tr.step, "epoch": 2, "batch_index": 0, "config": cfg.to_json()})
ck2.close()
import evaluate as eval_cli
sys.argv = ["evaluate.py", "--config", "tiny", "--workdir", wd, "--cpu",
            "--greedy-only", "--max-utts", "8", "--step", str(tr.step)]
eval_cli.main()
print("== probe evaluate CLI: ok")
shutil.rmtree(wd)
print("VERIFY-DRIVE-OK")
