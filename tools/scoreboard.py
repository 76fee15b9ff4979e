#!/usr/bin/env python3
"""Regenerate the SURVEY.md §8 scoreboard block from artifacts (dev
tooling, not part of the library). Every number in the block is DERIVED —
from the committed bench artifact, the sbt test log, and a Verify dump —
never typed by hand, so the scoreboard can't drift from the artifacts.

Usage:
  python3 tools/scoreboard.py [--test-log PATH] [--verify-out DIR]
                              [--bench PATH] [--survey PATH]

Rewrites the text between `<!-- scoreboard:begin -->` and
`<!-- scoreboard:end -->` in SURVEY.md. Inputs that are missing are
reported as "n/a" rather than guessed.
"""
import argparse, json, re, sys, datetime


def bench_summary(path):
    try:
        d = json.load(open(path))
    except Exception:
        return None
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    worst = max(qs.items(), key=lambda kv: kv[1]) if qs else ("n/a", 0.0)
    return {
        "total": d.get("value"),
        "nq": len(d.get("queries", {})),
        "errors": len(d.get("errors", {})),
        "runs": d.get("runs", 1),
        "sf": d.get("sf", "?").rstrip("/").split("/")[-1],
        "worst_name": worst[0],
        "worst_sec": worst[1],
    }


def test_summary(path):
    """Sum every per-suite `Tests: succeeded N, failed M` line of an sbt
    test log; also capture the final aggregate `Total N` line if present."""
    if not path:
        return None
    try:
        log = open(path, errors="replace").read()
    except Exception:
        return None
    per = re.findall(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+)", log)
    if not per:
        return None
    succ = sum(int(p[0]) for p in per)
    fail = sum(int(p[1]) for p in per)
    suites = len(per)
    passed = "All tests passed" in log
    return {"succ": succ, "fail": fail, "suites": suites, "green": passed}


def verify_summary(outdir):
    if not outdir:
        return None
    try:
        oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    except Exception:
        return None
    return {"nq": len(oracle)}


def scaling_summary(path):
    try:
        d = json.load(open(path))
    except Exception:
        return None
    qs = d.get("queries", {})
    ratios = sorted(v["ratio"] for v in qs.values() if v.get("ratio", -1) >= 0)
    if not ratios:
        return None

    def sf(key):  # ".../sf0.01" -> 0.01, or None if unparseable
        m = re.search(r"sf([0-9.]+)/?$", str(d.get(key, "")))
        try:
            return float(m.group(1)) if m else None
        except ValueError:
            return None

    small, large = sf("small"), sf("large")
    growth = (large / small) if small and large and small > 0 else None
    return {"n": len(ratios), "lo": ratios[0], "hi": ratios[-1],
            "runs": d.get("runs", 1),
            "small": small, "large": large, "growth": growth}


def band_file(path, out):
    """Derive a per-query timing band from the committed bench artifact's
    min/max spread and write it next to it. The band makes cross-machine
    drift MECHANICAL: a later run (e.g. the driver's BENCH_r{N}.json) is
    in-family for a query iff its time lands inside [min/slack, max*slack]
    — slack covers machine noise beyond the sampled spread."""
    SLACK = 1.25
    try:
        d = json.load(open(path))
    except Exception:
        return None
    stats = d.get("stats", {})
    if not stats:
        return None
    band = {k: {"lo": round(v["min"] / SLACK, 4),
                "hi": round(v["max"] * SLACK, 4),
                "median": v["median"]}
            for k, v in stats.items()}
    json.dump({"slack": SLACK, "runs": d.get("runs", 1),
               "sf": d.get("sf"), "band": band},
              open(out, "w"), indent=0, sort_keys=True)
    return band


def driver_queries(path):
    """Per-query seconds from either bench shape: graft.Bench's own JSON
    line, or the driver's BENCH_r{N}.json wrapper ({n, rc, tail, parsed})
    whose `tail` is a TRUNCATED capture — scrape what survives."""
    try:
        d = json.load(open(path))
    except Exception:
        return None
    if "queries" in d:
        return d["queries"]
    if isinstance(d.get("parsed"), dict):
        return d["parsed"].get("queries", {})
    tail = d.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
    # the tail also carries the stats object; keep only first occurrences
    # (the flat queries map precedes stats) and drop non-query keys
    qs = {}
    for k, v in pairs:
        if k not in qs and k not in ("median", "min", "max",
                                     "shuffle_mb", "spill_mb", "value"):
            qs[k] = float(v)
    return qs


def drift_report(band, driver_bench):
    """Name every query of a driver bench run outside its committed band."""
    qs = driver_queries(driver_bench)
    if qs is None:
        return None
    out = []
    for q, sec in sorted(qs.items()):
        b = band.get(q)
        if b is None:
            out.append(f"  NEW   {q}: {sec:.2f}s (no committed band)")
        elif not (b["lo"] <= sec <= b["hi"]):
            out.append(f"  DRIFT {q}: {sec:.2f}s outside "
                       f"[{b['lo']:.2f}, {b['hi']:.2f}] "
                       f"(committed median {b['median']:.2f}s)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test-log")
    ap.add_argument("--verify-out")
    ap.add_argument("--bench", default="bench/BENCH_LOCAL.json")
    ap.add_argument("--scaling", default="bench/SCALING_LOCAL.json")
    ap.add_argument("--survey", default="SURVEY.md")
    ap.add_argument("--band-out", default="bench/BENCH_BAND.json")
    ap.add_argument("--driver-bench", help="a BENCH_r{N}.json to check "
                    "against the committed per-query band; prints drift "
                    "lines and exits without touching SURVEY.md")
    args = ap.parse_args()

    band = band_file(args.bench, args.band_out)
    if args.driver_bench:
        if not band:
            sys.exit("no committed bench stats to derive a band from")
        drifted = drift_report(band, args.driver_bench)
        if drifted is None:
            sys.exit(f"could not read {args.driver_bench}")
        nq = len(driver_queries(args.driver_bench) or {})
        print(f"{len(drifted)} of {nq} queries outside the committed band:")
        for line in drifted:
            print(line)
        return

    b = bench_summary(args.bench)
    t = test_summary(args.test_log)
    v = verify_summary(args.verify_out)
    sc = scaling_summary(args.scaling)

    lines = [f"<!-- generated by tools/scoreboard.py on "
             f"{datetime.date.today().isoformat()} — do not edit by hand -->"]
    if v:
        lines.append(f"- **Driver-contract queries:** {v['nq']} "
                     f"(each with a DuckDB oracle; local gate = "
                     f"`tools/compare.py` over the Verify dump).")
    if t:
        state = "green" if (t["fail"] == 0 and t["green"]) else \
                f"**{t['fail']} FAILED**"
        # sbt prints one aggregate line per run; only call out a suite
        # count when the log actually carried per-suite summaries
        across = f" across {t['suites']} suites" if t["suites"] > 1 else ""
        lines.append(f"- **Tests:** {t['succ']}{across}, "
                     f"{state} (summed from the sbt test log).")
    if b:
        lines.append(
            f"- **Bench (committed artifact, {b['sf']}, median of "
            f"{b['runs']} runs/query):** {b['total']:.1f}s total over "
            f"{b['nq']} queries, {b['errors']} errors; worst "
            f"`{b['worst_name']}` {b['worst_sec']:.1f}s.")
    # the latest driver-side bench artifact, quoted VERBATIM next to the
    # builder's line — the two runs happen on different machine load, so
    # the scoreboard must carry both rather than let the builder's number
    # stand in for the driver's (scraped tolerant of the driver wrapper's
    # truncated tail)
    import glob as _glob
    rounds = sorted(_glob.glob("BENCH_r*.json"),
                    key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if rounds:
        dq = driver_queries(rounds[-1]) or {}
        dq = {k: v for k, v in dq.items() if v >= 0}
        if dq:
            worst = max(dq.items(), key=lambda kv: kv[1])
            lines.append(
                f"- **Driver bench (`{rounds[-1]}`, driver machine/load):** "
                f"{sum(dq.values()):.1f}s over the {len(dq)} queries the "
                f"artifact carries; worst `{worst[0]}` {worst[1]:.1f}s.")
    if sc:
        if sc["growth"]:
            pair = (f"sf{sc['small']:g}→sf{sc['large']:g} = "
                    f"{sc['growth']:g}× data")
            judged = (f"all below the {sc['growth']:g}× data growth"
                      if sc["hi"] < sc["growth"] else
                      f"**worst ratio {sc['hi']:.2f}× meets or exceeds the "
                      f"{sc['growth']:g}× data growth — investigate**")
        else:
            pair = "scale pair unparsed from artifact"
            judged = "data-growth comparison unavailable"
        lines.append(
            f"- **Scaling (committed artifact, {pair}, "
            f"median of {sc['runs']} runs):** wall-clock ratios "
            f"{sc['lo']:.2f}–{sc['hi']:.2f}× across {sc['n']} plan "
            f"families — {judged}.")
    block = "\n".join(lines)

    survey = open(args.survey).read()
    begin, end = "<!-- scoreboard:begin -->", "<!-- scoreboard:end -->"
    if begin not in survey or end not in survey:
        sys.exit(f"markers {begin} / {end} not found in {args.survey}")
    new = re.sub(
        re.escape(begin) + r".*?" + re.escape(end),
        begin + "\n" + block + "\n" + end,
        survey, flags=re.S)
    open(args.survey, "w").write(new)
    print(block)


if __name__ == "__main__":
    main()
