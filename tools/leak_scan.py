#!/usr/bin/env python3
"""DEV TOOL: fresh leak scan over the repo's source + docs, written to
LEAKCHECK.json with the scanned commit SHA and timestamp embedded so
every round's artifact is verifiably fresh (ADVICE round 7).

Categories mirror the driver's scan: internal imports/packages, internal
URLs/buckets, slack links, API-key shapes, suspicious env vars. The scan
is pattern-based and intentionally over-broad; hits are lists of
"path:line: excerpt" strings for human review.
"""
import json, os, re, subprocess, sys, datetime

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    # imports of non-public namespaces (anything not spark/scala/java/graft/duckdb/scalatest...)
    "internal-import": re.compile(
        r"^\s*import\s+(?!org\.apache\.|org\.scalatest\.|org\.scalacheck\.|scala\.|java[x]?\.|graft\.|org\.slf4j)"
        r"(com|net|io|ai|dev)\.[a-z]", re.M),
    "internal-url": re.compile(
        r"https?://(?!localhost|127\.0\.0\.1|github\.com|spark\.apache\.org|duckdb\.org|arxiv\.org|doi\.org|dl\.acm\.org|en\.wikipedia\.org)[a-z0-9.-]+\.(corp|internal|intra|lan)\b"),
    "internal-pkg2": re.compile(r"\b(artifactory|nexus)\.[a-z0-9.-]+\.[a-z]{2,}\b"),
    "internal-bucket": re.compile(r"\b(s3|gs|s3a|abfss?)://[a-z0-9._-]+"),
    "slack-link": re.compile(r"\b[a-z0-9-]+\.slack\.com\b|\bslack://"),
    "api-key": re.compile(r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16}|ghp_[A-Za-z0-9]{30,}|xox[baprs]-[A-Za-z0-9-]{10,})\b"),
    "axon-env": re.compile(r"\b[A-Z][A-Z0-9_]*(?:INTERNAL|CORP|SECRET_KEY|ACCESS_TOKEN)[A-Z0-9_]*\s*="),
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "README.md", "PERF.md", "COVERAGE.md", "SURVEY.md"]
EXT_OK = {".scala", ".sbt", ".py", ".md", ".json", ".sql", ".conf", ".properties"}


def files():
    for d in SCAN_DIRS:
        for base, _, names in os.walk(os.path.join(ROOT, d)):
            for n in names:
                if os.path.splitext(n)[1] in EXT_OK:
                    yield os.path.join(base, n)
    for f in SCAN_FILES:
        p = os.path.join(ROOT, f)
        if os.path.exists(p):
            yield p


def infer_round():
    """Refusal-with-hint when no argv is given (ADVICE r18: the old
    max(N)+1 inference silently stamps round N+1 when a restamp for
    round N runs after the driver already landed CORRECTNESS_r{N}.json
    — a scripted caller never reads the printed notice). When any
    CORRECTNESS files exist the round is ambiguous by one, so require
    it explicitly; with none, round 1 is unambiguous."""
    ns = []
    for n in os.listdir(ROOT):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", n)
        if m:
            ns.append(int(m.group(1)))
    if not ns:
        return 1
    mx = max(ns)
    sys.exit(
        f"leak_scan.py: round is ambiguous (CORRECTNESS_r{mx:02d}.json "
        f"exists — is this a restamp of round {mx} or a scan during "
        f"round {mx + 1}?). Pass the round explicitly: "
        f"tools/leak_scan.py <round>")


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else infer_round()
    hits = {k: [] for k in PATTERNS}
    for path in files():
        rel = os.path.relpath(path, ROOT)
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for cat, pat in PATTERNS.items():
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                excerpt = m.group(0)[:80]
                hits[cat].append(f"{rel}:{line}: {excerpt}")
    sha = subprocess.run(["git", "rev-parse", "HEAD"], cwd=ROOT,
                         capture_output=True, text=True).stdout.strip()
    out = {
        "round": rnd,
        "scanned_commit": sha,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
            .strftime("%Y-%m-%dT%H:%M:%SZ"),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=2)
    # round is printed so a wrong inference is visible at stamp time:
    # the inference assumes restamps happen BEFORE the driver lands
    # CORRECTNESS_r{N}.json for the round being stamped — pass the
    # round explicitly when stamping after a round-closing commit.
    print(f"LEAKCHECK.json: {out['n_hits']} hits @ {sha[:12]} (round {rnd})")
    for cat, v in hits.items():
        for h in v[:10]:
            print(f"  [{cat}] {h}")


if __name__ == "__main__":
    main()
