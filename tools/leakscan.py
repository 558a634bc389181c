#!/usr/bin/env python3
"""Builder-side leak scan, self-evidencing (round-9 verdict item 4).

Re-implements the hygiene categories the driver's LEAKCHECK tracks with
public patterns only — nonpublic hostnames/buckets/imports, chat links,
credential-shaped strings, suspicious env-var reads — over every
tracked source/doc file, then stamps the result (scan time, HEAD
commit, file+hit counts) into LEAKCHECK.json under `self_scan`,
preserving whatever the driver last wrote. Exit 1 on any hit.

Usage: python3 tools/leakscan.py [repo_root]
"""
import json, os, re, subprocess, sys, datetime

root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))

PATTERNS = {
    # JVM imports rooted in an external-vendor namespace (value-level
    # imports like `x.implicits._` and the org.apache/scala/java/graft
    # trees are fine; python tool imports are driver-side and exempt)
    "suspicious-import": re.compile(
        r"^\s*import\s+(?:com|net|io|ai|dev|corp|internal)\.[\w.]+", re.M),
    # URLs that are not apache/github/wikipedia/arxiv/json-schema class
    # public references
    "nonpublic-url": re.compile(
        r"https?://(?!(?:www\.)?(?:apache\.org|spark\.apache\.org"
        r"|parquet\.apache\.org|github\.com|raw\.githubusercontent\.com"
        r"|en\.wikipedia\.org|arxiv\.org|duckdb\.org|scala-lang\.org"
        r"|docs\.oracle\.com|openjdk\.org|rocksdb\.org|json-schema\.org"
        r"|example\.com|localhost|127\.0\.0\.1))[\w.-]+"),
    "cloud-bucket": re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w.-]+"),
    "chat-link": re.compile(r"\b\w+\.slack\.com\b|slack://|#[a-z0-9-]*claude"),
    "credential": re.compile(
        r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|ghp_[A-Za-z0-9]{36}"
        r"|xox[baprs]-[A-Za-z0-9-]{10,}|-----BEGIN [A-Z ]*PRIVATE KEY-----)"),
    # env vars read by library code that aren't the documented harness
    # knobs (SPARK_GRAFT_*) or standard spark/java/build ones
    "suspicious-env": re.compile(
        r"""sys\.env(?:\.get(?:OrElse)?)?\(\s*"(?!SPARK_|JAVA_|COURSIER_"""
        r"""|PATH\b|HOME\b|TMPDIR\b|USER\b)[A-Z][A-Z0-9_]*"""),
}
SCAN_EXT = {".scala", ".py", ".md", ".sbt", ".json", ".sql", ".txt"}
# artifacts the driver writes (benchmarks, verdicts) are not library
# code; the scanner's own pattern definitions would self-match
SKIP_NAMES = {"LEAKCHECK.json", "leakscan.py"}

def tracked_files():
    out = subprocess.run(["git", "-C", root, "ls-files"],
                         capture_output=True, text=True, check=True).stdout
    return [f for f in out.splitlines()
            if os.path.splitext(f)[1] in SCAN_EXT
            and os.path.basename(f) not in SKIP_NAMES]

hits = {k: [] for k in PATTERNS}
files = tracked_files()
for f in files:
    try:
        text = open(os.path.join(root, f), encoding="utf-8",
                    errors="replace").read()
    except OSError:
        continue
    for name, pat in PATTERNS.items():
        for m in pat.finditer(text):
            line = text.count("\n", 0, m.start()) + 1
            hits[name].append(f"{f}:{line}:{m.group(0)[:80]}")

head = subprocess.run(["git", "-C", root, "rev-parse", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
n = sum(len(v) for v in hits.values())
stamp = {
    "scanned_at": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
    "commit": head,
    "n_files": len(files),
    "n_hits": n,
    "hits": {k: v for k, v in hits.items() if v},
}

lc_path = os.path.join(root, "LEAKCHECK.json")
try:
    lc = json.load(open(lc_path))
except (OSError, ValueError):
    lc = {}
lc["self_scan"] = stamp
with open(lc_path, "w") as fh:
    json.dump(lc, fh, indent=2)
    fh.write("\n")

print(f"[leakscan] {len(files)} files, {n} hits at {head[:9]}")
for k, v in hits.items():
    for h in v:
        print(f"  {k}: {h}")
sys.exit(1 if n else 0)
