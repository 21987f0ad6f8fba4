#!/usr/bin/env bash
# One-command out-of-distribution (OOD) correctness gate — the standing
# round-close step (r14 verdict ask #8; protocol from R14_NOTES "OOD gate").
#
# Builds a corpus the driver gate has never seen — ScaleGen OPEN-mode
# documents+embeddings (vocabulary grows with the corpus, different dup
# structure) beside the base-SF relational tables — then dumps EVERY
# SparkEntry query on it and DuckDB-compares each against its oracle SQL
# over the same parquet. Oracle parity on a second distribution is the
# strongest correctness evidence beyond the driver gate itself.
#
# Also scans the dump's stderr for whole-stage-codegen fallbacks (Janino
# "grows beyond 64 KB") — an interpreted hot stage is invisible at small
# SF and expensive at 100x, so the clean-WARN check is part of the gate.
#
# Usage:           tools/ood_gate.sh
# Knobs (env):     OOD_DIR OOD_OUT OOD_DOCS OOD_VECS OOD_BASE_SF
#                  OOD_EMB=iso|blobs (embeddings geometry — blobs runs the
#                  whole gate on a PLANTED-CLUSTER corpus: the Lloyd /
#                  routing / recall oracles replay on clustered data, a
#                  different numeric path than the isotropic default)
#                  SPARK_GRAFT_CPUS SKIP_COMPILE=1 (classes already fresh)
# Exit:            0 = all queries pass AND no codegen fallback; 1 otherwise
set -euo pipefail
cd "$(dirname "$0")/.."

OOD_DIR=${OOD_DIR:-/tmp/graft_ood_sf}
OOD_OUT=${OOD_OUT:-/tmp/graft_ood_out}
OOD_DOCS=${OOD_DOCS:-5000}
OOD_VECS=${OOD_VECS:-2000}
OOD_BASE_SF=${OOD_BASE_SF:-/root/testdata/sf0.01}
OOD_EMB=${OOD_EMB:-iso}
CPUS=${SPARK_GRAFT_CPUS:-32}
LOG=${OOD_LOG:-/tmp/graft_ood_verify.log}

if [[ "${SKIP_COMPILE:-0}" != "1" ]]; then
  sbt -batch compile >/dev/null
fi

OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
    java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done
OPENS+=(--add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED)
run_main() {
  SPARK_GRAFT_CPUS=$CPUS java "${OPENS[@]}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx48g -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
}

echo "[ood] corpus: $OOD_DIR (docs=$OOD_DOCS vecs=$OOD_VECS open emb=$OOD_EMB; relational from $OOD_BASE_SF)"
rm -rf "$OOD_DIR" "$OOD_OUT"
mkdir -p "$OOD_DIR"
for t in region nation customer supplier part orders lineitem events; do
  ln -s "$OOD_BASE_SF/$t.parquet" "$OOD_DIR/$t.parquet"
done
run_main graft.ScaleGen "$OOD_DIR" "$OOD_DOCS" "$OOD_VECS" open "$OOD_EMB" \
  2> >(grep -E '^\[scalegen\]' >&2 || true)

echo "[ood] dumping full gate (log: $LOG)"
run_main graft.Verify "$OOD_DIR" "$OOD_OUT" 2> "$LOG" || {
  echo "[ood] Verify exited nonzero — tail of $LOG:"; tail -20 "$LOG"; exit 1; }
# A thrown query is a hard gate failure even if its output path ends up
# absent-but-comparable downstream (ADVICE r15): fold into the final check.
THREW=0
if grep '\[verify\].*failed' "$LOG"; then
  THREW=1
  echo "[ood] queries THREW (above)"
fi

FALLBACK=0
if grep -Ei 'grows beyond 64 KB|whole-stage codegen.*(disabled|fall)|InternalCompilerException' "$LOG" > /tmp/graft_ood_fallback.txt; then
  FALLBACK=1
  echo "[ood] CODEGEN FALLBACK during dump (interpreted hot stage):"
  sort -u /tmp/graft_ood_fallback.txt | head -10
else
  echo "[ood] codegen clean: no Janino 64KB / fallback WARNs in the dump"
fi

python3 tools/local_verify.py "$OOD_DIR" "$OOD_OUT" | tee /tmp/graft_ood_compare.txt
PASS=$(tail -1 /tmp/graft_ood_compare.txt)
echo "[ood] result: $PASS; codegen fallback: $([[ $FALLBACK == 1 ]] && echo YES || echo none); threw: $([[ $THREW == 1 ]] && echo YES || echo none)"
[[ $FALLBACK == 0 && $THREW == 0 ]] && tail -1 /tmp/graft_ood_compare.txt | grep -qE '^([0-9]+)/\1 pass$'
