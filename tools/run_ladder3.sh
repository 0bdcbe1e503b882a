#!/bin/bash
# Retry-hardened remainder of the WER ladder: the axon remote-compile
# service wedges intermittently (client blocks forever in ep_poll), so
# every TPU command gets a timeout and up to 4 attempts, with a liveness
# probe between attempts.
set -x
cd /root/repo

probe () {
  timeout 110 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((263,263))
print("tpu-ok", float((x@x).sum()))
EOF
}

wait_tpu () {
  until probe; do echo "tpu down $(date +%H:%M:%S)"; sleep 90; done
}

retry () {
  # retry <timeout_s> <logfile> cmd...
  local to=$1 log=$2; shift 2
  for i in 1 2 3 4; do
    wait_tpu
    if timeout "$to" "$@" > "$log" 2>&1; then return 0; fi
    echo "RETRY($i) failed: $* (see $log)"
    sleep 30
  done
  echo "GIVEN-UP: $*"
  return 1
}

# conv: trained; 512-utt standard eval still missing
retry 1500 runs/conv_r2.eval.json \
  python evaluate.py --config conv --workdir runs/conv_r2 --max-utts 512

retry 5400 runs/fusion_r2.train.log \
  python train.py --config fusion --workdir runs/fusion_r2 --resume
retry 1500 runs/fusion_r2.eval.json \
  python evaluate.py --config fusion --workdir runs/fusion_r2 --max-utts 512
retry 1500 runs/fusion_r2.eval_stress.json \
  python evaluate.py --config fusion --workdir runs/fusion_r2 --max-utts 512 \
      --eval-noise 1.0 --eval-shift 50
retry 1500 runs/fusion_r2.eval_nolm.json \
  python evaluate.py --config fusion --workdir runs/fusion_r2 --max-utts 512 \
      --lm-weight 0
retry 1500 runs/fusion_r2.eval_stress_nolm.json \
  python evaluate.py --config fusion --workdir runs/fusion_r2 --max-utts 512 \
      --eval-noise 1.0 --eval-shift 50 --lm-weight 0

retry 5400 runs/conformer_r2.train.log \
  python train.py --config conformer --workdir runs/conformer_r2 --resume
retry 1500 runs/conformer_r2.eval.json \
  python evaluate.py --config conformer --workdir runs/conformer_r2 --max-utts 512
retry 1500 runs/conformer_r2.eval_stress.json \
  python evaluate.py --config conformer --workdir runs/conformer_r2 \
      --max-utts 512 --eval-noise 1.0 --eval-shift 50

echo LADDER3-DONE
