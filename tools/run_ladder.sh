#!/bin/bash
# WER-ladder runs (BASELINE configs 2-5) on the local TPU, sequentially.
# Records training logs + eval JSON under runs/<name>_r2/.
set -x
cd /root/repo

run () {
  local cfg=$1; shift
  local wd=runs/${cfg}_r2
  python train.py --config "$cfg" --workdir "$wd" "$@" \
      > "$wd.train.log" 2>&1 || { echo "TRAIN-FAIL $cfg"; return 1; }
  python evaluate.py --config "$cfg" --workdir "$wd" --max-utts 512 \
      > "$wd.eval.json" 2>&1 || echo "EVAL-FAIL $cfg"
}

mkdir -p runs/base_r2 runs/conv_r2 runs/fusion_r2 runs/conformer_r2
run base
run conv
run fusion
# fusion extras: isolate the LM gain
python evaluate.py --config fusion --workdir runs/fusion_r2 --max-utts 512 \
    --lm-weight 0 > runs/fusion_r2.eval_nolm.json 2>&1
run conformer
# conformer extras: blank-collapse speed/accuracy point
python evaluate.py --config conformer --workdir runs/conformer_r2 \
    --max-utts 512 --blank-collapse 0.9999 \
    > runs/conformer_r2.eval_bc.json 2>&1
echo LADDER-DONE
