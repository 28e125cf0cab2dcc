#!/usr/bin/env python3
"""Merge bench sessions into one artifact by per-query MIN of
run-medians (driver-side tooling, not library code).

graft.Bench already takes the per-query min across GRAFT_BENCH_RUNS
suite passes inside one session; when the box's minutes-long
contention waves corrupt whole sessions, the same statistic extended
ACROSS same-code sessions recovers the warm floor the artifact is
meant to record (NOTES_r12 §4c). This tool makes that merge
reproducible from the committed BENCH_HISTORY.jsonl instead of an
ad-hoc edit: pick sessions by their `at` timestamps, get the exact
merged file.

Usage: bench_merge.py <BENCH_HISTORY.jsonl> <out.json> <at-prefix> [at-prefix ...]
       (each at-prefix selects one history record by timestamp prefix;
        the LAST selected record supplies the non-query metadata)
"""
import sys, json

hist_path, out_path = sys.argv[1], sys.argv[2]
prefixes = sys.argv[3:]

hist = [json.loads(l) for l in open(hist_path)]
sess = []
for p in prefixes:
    matches = [h for h in hist if h["at"].startswith(p)]
    if len(matches) != 1:
        sys.exit(f"at-prefix {p!r} matches {len(matches)} records, need exactly 1")
    sess.append(matches[0])

# comparability guard: refuse to merge sessions that measured different
# corpora/metrics, or subset (GRAFT_BENCH_ONLY) probes — a min across
# those is a plausible-looking but corrupted artifact
for key in ("sf", "metric", "unit"):
    vals = {s.get(key) for s in sess}
    if len(vals) != 1:
        sys.exit(f"sessions disagree on {key}: {sorted(map(str, vals))}")
allq = sorted(set().union(*[set(s["queries"]) for s in sess]))
for s in sess:
    if len(s["queries"]) < 0.95 * len(allq):
        sys.exit(f"session {s['at']} covers only {len(s['queries'])} of "
                 f"{len(allq)} queries — looks like a subset run, refusing")

base = dict(sess[-1])
base.pop("at", None)
base.pop("out", None)
merged = {q: min(s["queries"][q] for s in sess if q in s["queries"]) for q in allq}
total = sum(merged.values())
base["queries"] = merged
base["value"] = total
base["runs"] = sum(s.get("runs", 1) for s in sess)
# carry the MEDIAN across sessions alongside the min (r12 verdict
# item 5): min is the contention-immune round-over-round comparable,
# median shows drift without re-deriving from BENCH_HISTORY. Each
# session value is already that session's min-of-run-medians.
import statistics
med = {q: statistics.median([s["queries"][q] for s in sess if q in s["queries"]])
       for q in allq}
base["queries_median_of_sessions"] = med
base["value_median_of_sessions"] = sum(med.values())
# the min statistic pairs with the smallest measured drain floor: the
# streaming-query minima predominantly come from the least-contended
# session, so subtracting the last session's (possibly inflated) floor
# would understate the ex-floor total
floors = [s["stream_drain_floor_s"] for s in sess
          if s.get("stream_drain_floor_s", -1) >= 0]
if floors and base.get("stream_queries", 0) > 0:
    base["stream_drain_floor_s"] = min(floors)
    base["total_ex_drain_floor"] = total - min(floors) * base["stream_queries"]
passes = "+".join(str(s.get("runs", 1)) for s in sess)
partial = [q for q in allq if any(q not in s["queries"] for s in sess)]
base["merged_sessions"] = [s["at"] for s in sess]
note = (f"per-query min of run-medians across {len(sess)} same-code bench "
        f"sessions ({passes} full suite passes; `merged_sessions` lists the "
        f"BENCH_HISTORY.jsonl records; regenerate via tools/bench_merge.py; "
        f"drain floor = min across sessions, matching the min statistic)")
if partial:
    note += f"; queries absent from some sessions (min over fewer passes): {','.join(partial)}"
base["protocol_note"] = note
json.dump(base, open(out_path, "w"), indent=1)
print(f"wrote {out_path}: {total:.2f}s / {len(merged)} queries, {base['runs']} passes")
