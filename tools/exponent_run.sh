#!/usr/bin/env bash
# Full-gate 1x/10x scale-exponent run — round-close hygiene (r13 ask #2,
# r14 verdict ask #7), the R14_NOTES protocol made a standing one-command
# step.
#
# Builds two ScaleGen OPEN-mode corpora (vocabulary grows with the corpus —
# the honest scaling regime) with relational tables a true 10x apart
# (sf0.01 vs sf0.1), runs the FULL graft.Bench map on each back-to-back
# (the box swings 2x across sessions; back-to-back is the comparable
# protocol), and prints the per-query exponent table: exp = log10(t10/t1),
# linear reads 1.0. Any exponent above a query's scaladoc'd asymptotics is
# a real scale pathology — adjudicate and pin it (the r14 s_power_iter
# catch).
#
# Usage:           tools/exponent_run.sh
# Knobs (env):     SPARK_GRAFT_CPUS SPARK_GRAFT_REPS (default 2)
#                  X1_DIR X10_DIR SKIP_COMPILE=1 SKIP_GEN=1 (corpora fresh)
# Artifacts:       /tmp/graft_bench_x1.json /tmp/graft_bench_x10.json
#                  (target/bench.json is saved and restored around the runs)
set -euo pipefail
cd "$(dirname "$0")/.."

X1=${X1_DIR:-/tmp/graft_x1}
X10=${X10_DIR:-/tmp/graft_x10}
REPS=${SPARK_GRAFT_REPS:-2}
CPUS=${SPARK_GRAFT_CPUS:-32}

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
  java "${OPENS[@]}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Xmx48g -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
}

build_corpus() { # dir base_sf n_docs n_vecs
  local dir=$1 base=$2 docs=$3 vecs=$4
  rm -rf "$dir"; mkdir -p "$dir"
  local t
  for t in region nation customer supplier part orders lineitem events; do
    ln -s "$base/$t.parquet" "$dir/$t.parquet"
  done
  SPARK_GRAFT_CPUS=$CPUS run_main graft.ScaleGen "$dir" "$docs" "$vecs" open \
    2> >(grep -E '^\[scalegen\]' >&2 || true)
}

if [[ "${SKIP_GEN:-0}" != "1" ]]; then
  echo "[exp] building 1x corpus ($X1: sf0.01 relational + 5000/2000 open)"
  build_corpus "$X1" /root/testdata/sf0.01 5000 2000
  echo "[exp] building 10x corpus ($X10: sf0.1 relational + 50000/20000 open)"
  build_corpus "$X10" /root/testdata/sf0.1 50000 20000
fi

# the full-map Bench overwrites target/bench.json (the judged artifact
# path) — save and restore it around the two runs
SAVED=""
if [[ -f target/bench.json ]]; then
  SAVED=$(mktemp /tmp/graft_bench_saved.XXXX.json)
  cp target/bench.json "$SAVED"
fi
restore() { [[ -n "$SAVED" ]] && cp "$SAVED" target/bench.json || true; }
trap restore EXIT

run_bench() { # sf_dir out_json log
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_REPS=$REPS \
    run_main graft.Bench > /dev/null 2> "$3"
  mv target/bench.json "$2"
}

echo "[exp] benching 1x (reps=$REPS, cpus=$CPUS, log /tmp/graft_exp_x1.log)"
run_bench "$X1" /tmp/graft_bench_x1.json /tmp/graft_exp_x1.log
echo "[exp] benching 10x (log /tmp/graft_exp_x10.log)"
run_bench "$X10" /tmp/graft_bench_x10.json /tmp/graft_exp_x10.log

python3 tools/exponents.py /tmp/graft_bench_x1.json /tmp/graft_bench_x10.json --md

# ---- opt-in third decade (r15 verdict ask #6): DECADE3=1 -----------------
# The r15 hand-run 100x probe caught two REAL walls the 10x run read as
# healthy sublinear (the PQ struct constant, the fixed-K kNN N^2/K). This
# makes it one command: bench the DECADE3_TOP most expensive queries (by
# 10x min-of-reps) on a 100x open corpus and print the 10x->100x exponent
# table. Budgeted, not the full gate. DECADE3_SKIP excludes the known,
# documented fixed-K walls (the gate's oracle-pinned K=8 kNN family —
# s_knn_graph_auto IS the scale path and is always included); clear it to
# measure them anyway.
if [[ "${DECADE3:-0}" == "1" ]]; then
  X100=${X100_DIR:-/tmp/graft_x100}
  TOPN=${DECADE3_TOP:-25}
  SKIP=${DECADE3_SKIP:-s_knn_graph,s_knn_accuracy,s_knn_density,s_hubness,s_triplets}
  if [[ "${SKIP_GEN:-0}" != "1" || ! -d "$X100" ]]; then
    echo "[exp] building 100x corpus ($X100: sf0.1 relational + 500000/200000 open)"
    build_corpus "$X100" /root/testdata/sf0.1 500000 200000
  fi
  # always-include rows: the scale-path dials whose 10x->100x exponents the
  # verdict adjudicates every round even when they are cheap at 10x (r16
  # verdict ask #6 extended the list to the multi-probe/recall/manifest tier)
  FORCE=${DECADE3_FORCE:-s_knn_graph_auto,d_embedding_neardup_auto,d_embedding_neardup_probe2,d_neardup_recall,d_incremental_near,d_neardup_recall_grid,d_embedding_neardup_trained,d_embedding_neardup_hier,d_embedding_clusters_auto,s_ivf_topk_auto,s_cell_balance_auto,s_cell_balance_2level,s_route_agreement,s_route_curve,d_neardup_recall_2level,d_neardup_recall_melt,d_semantic_dedup_auto,d_semantic_sweep_auto,s_triplets_auto}
  SUBSET=$(python3 - "$TOPN" "$SKIP" "$FORCE" <<'PY'
import json, sys
top_n, skip = int(sys.argv[1]), set(sys.argv[2].split(","))
force = [f for f in sys.argv[3].split(",") if f]
q = None
with open("/tmp/graft_bench_x10.json") as f:
    for line in f:
        d = json.loads(line)
        if d.get("metric") == "total":
            q = d.get("queries_min") or d["queries"]
if not q:  # ADVICE r16: an unbound q raised NameError that the command
    # substitution swallowed, silently benching ZERO queries
    sys.exit("DECADE3: no metric=total line in /tmp/graft_bench_x10.json")
names = [k for k, _ in sorted(q.items(), key=lambda kv: -kv[1])
         if k not in skip][:top_n]
names += [f for f in force if f in q and f not in names]
if not names:
    sys.exit("DECADE3: empty 100x subset after skip filtering")
print(",".join(sorted(names)))
PY
) || { echo "[exp] DECADE3 subset selection FAILED" >&2; exit 1; }
  [[ -n "$SUBSET" ]] || { echo "[exp] DECADE3 subset empty" >&2; exit 1; }
  echo "[exp] 100x subset ($TOPN most expensive at 10x + the auto-K graph):"
  echo "      $SUBSET"
  echo "[exp] benching 100x (log /tmp/graft_exp_x100.log)"
  SPARK_GRAFT_SF_DIR=$X100 SPARK_GRAFT_CPUS=$CPUS SPARK_GRAFT_REPS=$REPS \
    SPARK_GRAFT_QUERIES=$SUBSET \
    run_main graft.Bench > /dev/null 2> /tmp/graft_exp_x100.log
  mv target/bench_subset.json /tmp/graft_bench_x100.json
  echo "[exp] 10x -> 100x exponent table (second decade):"
  python3 tools/exponents.py /tmp/graft_bench_x10.json /tmp/graft_bench_x100.json --md
fi
