#!/usr/bin/env bash
# Round-18 proof chain, REORDERED TAIL — same frozen HEAD, same
# /tmp/proof_r18 log dir and .done markers as tools/proof_r18.sh
# (test + verify001 + check001 completed there and are skipped here).
#
# Why the reorder: this round's box runs ~4-5x slower than the r16
# chain's measurements (hypervisor CPU steal — `sbt test` took 1h23
# against the judge's 16m46 on the identical HEAD). At that pace the
# r18.sh order (100x -> 1000x -> 10x -> bench) would spend the whole
# remaining round inside verify100 and lose the THREE-ROUNDS-STALE
# tiers the r17 verdict named first. So the tail runs in staleness
# order instead, committing each tier file as its check lands:
#   1. 10x  — full 222-query surface (CORRECTNESS_SCALE.json, r15-stale)
#   2. 1000x — scale CORE (CORRECTNESS_SCALE_1000.json, r15-stale)
#   3. bench — BENCH_FULL_r18.json, on the just-proven-idle box
#   4. 100x — full surface (CORRECTNESS_SCALE_100.json, only r16-stale;
#      runs last and simply gets as far as the round allows)
# Every step still refuses to start beside a foreign JVM (bench purity
# keeps the structural guarantee; correctness steps inherit it for
# free), and everything runs on the one frozen HEAD d9fa657.
set -euo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/proof_r18
mkdir -p "$LOG"
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=64g

guard_idle() {
  local strays
  strays=$(pgrep -f 'java.*(sbt-launch|graft|xsbt)' || true)
  if [ -n "$strays" ]; then
    echo "IDLE GUARD: foreign JVM(s) alive before step: $strays" >&2
    ps -o pid,etime,args -p "$(echo "$strays" | paste -sd,)" >&2 || true
    exit 1
  fi
}

# identical CORE list to proof_r18.sh
CORE="q_assembly_pipeline q_contamination q_curation_pipeline q_dedup_apply \
q_dedup_canonical q_dedup_components q_dedup_exact q_dedup_lines \
q_dedup_lsh_buckets q_dedup_minhash_sig q_dedup_paragraphs q_dedup_spans \
q_dedup_substrings q_heavy_hitters_approx q_quality_authority q_quality_c4 \
q_shard_jsonl q_shard_shuffle q_sketch_cms q_sketch_column q_text_sentences \
q_tfidf_keywords \
q_dedup_substrings_perdoc q_unigram_apply q_unigram_fertility \
q_dedup_image q_dedup_audio q_mixture_authority \
q_dedup_video q_dedup_hash_index q_stream_image_gate q_unigram_train \
q_stream_hash_indexed q_stream_audio_gate q_stream_video_gate \
q_dedup_video_drift q_unigram_train_soft q_text_pdf \
q_stream_band_indexed q_media_pipeline q_text_pdf_cid \
q_text_pdf_xref q_stream_band_cdc q_dedup_video_time q_doc_pipeline \
q_stream_hash_cdc q_stream_video_time q_mixed_pipeline \
q_text_pdf_extends q_stream_ivf_cdc q_stream_ivf_indexed \
q_stream_all_indexed"

step() { # step <name> <cmd...>
  local name="$1"; shift
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  guard_idle
  echo "== $name: $(date -u +%H:%M:%S)"
  "$@" > "$LOG/$name.log" 2>&1
  touch "$LOG/$name.done"
}

# completed by proof_r18.sh before the reorder (markers respected)
step test        sbt -batch test
step verify001   sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/v18_sf001"
step check001    python3 -u tools/check_oracle.py /tmp/v18_sf001 /root/testdata/sf0.01 --json "$LOG/corr_sf001.json"

# a scale dir whose mk step has no .done may be a partial write from
# the killed r18.sh tail — rebuild it from scratch
[ -f "$LOG/mk10.done" ]   || rm -rf /tmp/graft_scale10
[ -f "$LOG/mk1000.done" ] || rm -rf /tmp/graft_scale1000
[ -f "$LOG/mk100.done" ]  || rm -rf /tmp/graft_scale100

# 1. the 10x tier: full surface, the file the verdict names first
step mk10        python3 tools/make_scale_dir.py /root/testdata/sf0.01 /tmp/graft_scale10 10
step verify10    sbt -batch "runMain graft.Verify /tmp/graft_scale10 /tmp/v18_10"
step check10     python3 -u tools/check_oracle.py /tmp/v18_10 /tmp/graft_scale10 --json CORRECTNESS_SCALE.json

# 2. the 1000x scale core
step mk1000      python3 tools/make_scale_dir.py /root/testdata/sf0.01 /tmp/graft_scale1000 1000
step verify1000  sbt -batch "runMain graft.Verify /tmp/graft_scale1000 /tmp/v18_1000 $CORE"
step check1000   python3 -u tools/check_oracle.py /tmp/v18_1000 /tmp/graft_scale1000 --json CORRECTNESS_SCALE_1000.json $CORE

# 3. bench on the just-proven-idle box
step bench       env SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 GRAFT_BENCH_SIDECAR=BENCH_FULL_r18.json sbt -batch "runMain graft.Bench"

# 4. the 100x tier — one round stale, runs as far as the round allows
step mk100       python3 tools/make_scale_dir.py /root/testdata/sf0.01 /tmp/graft_scale100 100
step verify100   sbt -batch "runMain graft.Verify /tmp/graft_scale100 /tmp/v18_100"
step check100    python3 -u tools/check_oracle.py /tmp/v18_100 /tmp/graft_scale100 --json CORRECTNESS_SCALE_100.json

bash tools/sweep_tmp.sh 60 > "$LOG/sweep.log" 2>&1 || true
echo "== proof chain complete: $(date -u +%H:%M:%S)"
