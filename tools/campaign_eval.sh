#!/usr/bin/env bash
# Full decode-mode CER sweep over a trained campaign checkpoint
# (reference protocol: rnnt_eval.py:98-117 offline modes +
# online_rnnt_eval.py:114-142 streaming greedy/beam).
#
#   bash tools/campaign_eval.sh exp/campaign/ckpt_best 4096 [extra k=v ...]
#   (extras are appended to the --set list as bare dotted k=v pairs — do NOT
#   pass a second --set flag; argparse keeps only the last one)
#
# Runs every decode mode on the held-out dev split (seed 1) and the offline
# modes on a train-split sample (seed 0) so held-in vs held-out CER is
# visible. One process per mode keeps the shared-tunnel allocator clean
# (docs/RESULTS.md "large-batch fused anomalies"). The eval CLIs pick up the
# architecture from the persisted save_dir/train.yaml automatically.
set -uo pipefail
CKPT=${1:?checkpoint dir}
N=${2:-4096}
shift $(( $# >= 2 ? 2 : $# ))
DEVN=$(( N / 8 )); [ "$DEVN" -lt 4 ] && DEVN=4
cd "$(dirname "$0")/.."
FAILED=0
# one max-size length bucket: eval compiles ONE program per mode instead of
# up to frame_buckets x token_buckets (the dense beam programs compile for
# minutes each — 512-utt ctc_prefix_beam fell from >20 min to 6m40s; the
# ~2x padding compute is noise next to that)
BUCKETS=(--set "data.frame_buckets=(1536,)" "data.token_buckets=(64,)")

run() {
  echo "===== $* ====="
  # keep the CER headline + all sample pairs (the CLIs print the metric
  # lines before up to 4 REF/HYP sample pairs — tail must cover both)
  timeout 1200 python "$@" 2>&1 | grep -v -i warning | tail -24
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    FAILED=$((FAILED + 1))
    if [ "$rc" -eq 124 ]; then echo "***** TIMEOUT (1200s): $*"
    else echo "***** FAILED (rc=$rc): $*"; fi
  fi
}

for MODE in ctc_greedy ctc_prefix_beam rnnt_greedy rnnt_beam rnnt_rescoring; do
  run tools/evaluate.py --checkpoint "$CKPT" --workload online_rnnt \
    --mode "$MODE" --synthetic "$DEVN" --seed 1 "${BUCKETS[@]}" "$@"
done
# RNN-T beam + per-frame CTC shallow fusion (prefix_beam_search.py:99-101
# role): on the hard corpus the fusion delta vs plain rnnt_beam is a real
# quality comparison (the clean chord corpus decodes 0.00% either way)
run tools/evaluate.py --checkpoint "$CKPT" --workload online_rnnt \
  --mode rnnt_beam --ctc_fusion_weight 0.3 --synthetic "$DEVN" --seed 1 \
  "${BUCKETS[@]}" "$@"
# streaming greedy + beam-4 (one CLI reports both + relative improvement)
run tools/eval_streaming.py --checkpoint "$CKPT" \
  --synthetic "$DEVN" --seed 1 "${BUCKETS[@]}" "$@"
# held-in train-split sample (seed 0): protocol expects train CER ~ 0
for MODE in rnnt_greedy ctc_greedy; do
  run tools/evaluate.py --checkpoint "$CKPT" --workload online_rnnt \
    --mode "$MODE" --synthetic "$DEVN" --seed 0 "${BUCKETS[@]}" "$@"
done
if [ "$FAILED" -ne 0 ]; then
  echo "===== sweep finished with $FAILED failed mode(s) ====="
  exit 1
fi
echo "===== sweep complete: all modes ok ====="
