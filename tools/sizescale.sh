#!/bin/bash
# Size-growth scaling evidence for the minhashLsh job shape: the round-4
# stage attribution says the 2->8 deficit (0.73 vs extraction's 0.80-0.87)
# is a near-constant verify tail (Amdahl term) plus banded-shuffle
# coordination, both of which amortize as the corpus grows. If that is
# true, efficiency measured at 4x the docs must RISE toward the map-shape
# number; if it were an algorithmic scaling defect it would fall.
# Protocol: same one-JVM-per-run spark-submit recipe as every scaling
# campaign (BASELINE.md), conditions fully interleaved inside each pair so
# host steal epochs hit all four conditions alike.
set -e
cd "$(dirname "$0")/.."
J=target/scala-2.13/pdf_extractspark_2.13-0.1.0.jar
LOG=${1:-/tmp/sizescale.log}
PAIRS=${2:-3}
: > "$LOG"
for pair in $(seq 1 "$PAIRS"); do
  for docs in 600000 2400000; do
    for cores in 2 8; do
      echo "### pair=$pair docs=$docs cores=$cores $(date -u +%H:%M:%S)" >> "$LOG"
      SPARK_GRAFT_DEDUP_DOCS=$docs SPARK_GRAFT_DEDUP_JOB=minhash_lsh \
      /opt/spark/bin/spark-submit --master "local[$cores]" --driver-memory 24g \
        --conf "spark.driver.extraJavaOptions=-Xms24g -XX:+AlwaysPreTouch -XX:ParallelGCThreads=$cores" \
        --class graft.tools.DedupScaling "$J" "$cores" >> "$LOG" 2>/dev/null
    done
  done
done
echo DONE >> "$LOG"
