#!/bin/bash
# Remainder of the WER-ladder after the axon remote-compile outage:
# fusion + conformer trainings and the standard(0.25/15) + stress(1.0/50)
# eval rows. Waits for the TPU tunnel to answer before starting.
set -x
cd /root/repo

probe () {
  timeout 110 python - <<'EOF'
import jax, jax.numpy as jnp
x = jnp.ones((259,259))
print("tpu-ok", float((x@x).sum()))
EOF
}

until probe; do
  echo "tpu still down $(date +%H:%M:%S)"; sleep 120
done

run_cfg () {
  local cfg=$1
  local wd=runs/${cfg}_r2
  python train.py --config "$cfg" --workdir "$wd" \
      > "$wd.train.log" 2>&1 || { echo "TRAIN-FAIL $cfg"; return 1; }
  timeout 2400 python evaluate.py --config "$cfg" --workdir "$wd" \
      --max-utts 512 > "$wd.eval.json" 2>&1 || echo "EVAL-FAIL $cfg"
  timeout 2400 python evaluate.py --config "$cfg" --workdir "$wd" \
      --max-utts 512 --eval-noise 1.0 --eval-shift 50 \
      > "$wd.eval_stress.json" 2>&1 || echo "EVAL-STRESS-FAIL $cfg"
}

# conv: trained already; stress eval on TPU at 512 utts
timeout 2400 python evaluate.py --config conv --workdir runs/conv_r2 \
    --max-utts 512 --eval-noise 1.0 --eval-shift 50 \
    > runs/conv_r2.eval_stress.json 2>&1 || echo "EVAL-STRESS-FAIL conv"
timeout 2400 python evaluate.py --config conv --workdir runs/conv_r2 \
    --max-utts 512 > runs/conv_r2.eval.json 2>&1 || echo "EVAL-FAIL conv"

run_cfg fusion
# fusion extras: isolate the LM gain at both protocols
timeout 2400 python evaluate.py --config fusion --workdir runs/fusion_r2 \
    --max-utts 512 --lm-weight 0 > runs/fusion_r2.eval_nolm.json 2>&1
timeout 2400 python evaluate.py --config fusion --workdir runs/fusion_r2 \
    --max-utts 512 --eval-noise 1.0 --eval-shift 50 --lm-weight 0 \
    > runs/fusion_r2.eval_stress_nolm.json 2>&1

run_cfg conformer
timeout 2400 python evaluate.py --config conformer --workdir runs/conformer_r2 \
    --max-utts 512 --blank-collapse 0.9999 \
    > runs/conformer_r2.eval_bc.json 2>&1
echo LADDER2-DONE
