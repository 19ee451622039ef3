#!/usr/bin/env python3
"""Repo-side leak scan: no non-public system may be referenced.

The build contract is that everything here derives from public
knowledge only (Apache Spark, the public reference repo, published
papers). This scanner makes that claim reproducible from the repo
itself rather than an unverifiable driver-side attestation: it walks
the source and doc surface and flags

  * URLs/hosts outside a public allowlist,
  * cloud bucket URIs (s3:// gs:// abfss:// wasbs://),
  * environment-variable reads outside the engine's own SPARK_GRAFT_*
    / SPARK_DRIVER_MEM knobs and standard java/sbt vars,
  * "internal"-smelling tokens (corp/intranet/vpn hostname shapes).

Output is one JSON line stamped with the scan time and HEAD commit, so
an artifact can be tied to the exact tree it scanned. Exit 1 on hits.
Run by tools/gate.sh; scope: src/, tools/, *.md, build.sbt.
"""
import datetime
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PUBLIC_HOST_ALLOW = re.compile(
    r"(api\.gdc\.cancer\.gov|gdc\.cancer\.gov|xenabrowser\.net|"
    r"github\.com|apache\.org|spark\.apache\.org|scala-lang\.org|"
    r"scalatest\.org|duckdb\.org|localhost|127\.0\.0\.1|example\.(com|org)|"
    r"www\.w3\.org|json-schema\.org|maven\.org|mvnrepository\.com|"
    r"docs\.oracle\.com|openjdk\.org|en\.wikipedia\.org|arxiv\.org|doi\.org|"
    # RFC 2606/6761 reserved TLDs plus the redaction specs' obviously-
    # synthetic single-letter hosts (x.io, y.z, h.tld fixtures).
    r"[\w.-]+\.(?:invalid|test)|[a-z]\.(?:io|z|tld))$")
URL = re.compile(r"https?://([\w.-]+)")
BUCKET = re.compile(r"\b(?:s3a?|gs|abfss?|wasbs?)://[\w./-]+")
ENV_READ = re.compile(r'sys\.env(?:\.get(?:OrElse)?)?\s*[(]?\s*"([A-Z0-9_]+)"')
ENV_ALLOW = re.compile(r"^(SPARK_GRAFT_\w+|SPARK_DRIVER_MEM|JAVA_\w+|SBT_\w+|"
                       r"COURSIER_\w+|HOME|PATH|TMPDIR|USER)$")
INTERNAL_TOKEN = re.compile(
    r"\b[\w-]+\.(corp|internal|intranet|local)\.[\w-]+\b|\bvpn\.[\w.-]+\b",
    re.IGNORECASE)

SCAN_EXT = {".scala", ".py", ".sh", ".md", ".sbt", ".json"}
SKIP_DIRS = {"target", ".git", ".bloop", ".metals", "project", "spark-warehouse"}
# Artifacts that LIST scanner patterns or hits are not themselves leaks.
SKIP_FILES = {"check_leaks.py", "LEAKCHECK.json"}


def files():
    for base in ("src", "tools"):
        for root, dirs, names in os.walk(os.path.join(REPO, base)):
            dirs[:] = [d for d in dirs if d not in SKIP_DIRS]
            for n in names:
                if os.path.splitext(n)[1] in SCAN_EXT and n not in SKIP_FILES:
                    yield os.path.join(root, n)
    for n in sorted(os.listdir(REPO)):
        if (n.endswith(".md") or n == "build.sbt") and n not in SKIP_FILES:
            yield os.path.join(REPO, n)


hits = []
for path in files():
    rel = os.path.relpath(path, REPO)
    try:
        text = open(path, encoding="utf-8", errors="replace").read()
    except OSError as e:
        hits.append({"file": rel, "line": 0, "kind": "unreadable", "match": str(e)})
        continue
    for ln, line in enumerate(text.splitlines(), 1):
        for m in URL.finditer(line):
            if not PUBLIC_HOST_ALLOW.search(m.group(1)):
                hits.append({"file": rel, "line": ln, "kind": "url",
                             "match": m.group(0)[:120]})
        for m in BUCKET.finditer(line):
            hits.append({"file": rel, "line": ln, "kind": "bucket",
                         "match": m.group(0)[:120]})
        for m in ENV_READ.finditer(line):
            if not ENV_ALLOW.match(m.group(1)):
                hits.append({"file": rel, "line": ln, "kind": "env",
                             "match": m.group(1)})
        for m in INTERNAL_TOKEN.finditer(line):
            hits.append({"file": rel, "line": ln, "kind": "internal-token",
                         "match": m.group(0)[:120]})

commit = subprocess.run(["git", "-C", REPO, "rev-parse", "HEAD"],
                        capture_output=True, text=True).stdout.strip()
# One schema for every LEAKCHECK artifact (the r11 verdict flagged the
# driver's category map vs this tool's flat list): hits is a map
# category -> list of {file, line, match}, all categories always
# present so a clean scan still names what was looked for.
by_kind = {k: [] for k in ("url", "bucket", "env", "internal-token", "unreadable")}
for h in hits[:200]:
    by_kind.setdefault(h["kind"], []).append(
        {k: v for k, v in h.items() if k != "kind"})
report = {
    "scanned_at": datetime.datetime.now(datetime.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%SZ"),
    "commit": commit,
    "n_files": sum(1 for _ in files()),
    "n_hits": len(hits),
    "hits": by_kind,
}
print(json.dumps(report))
sys.exit(1 if hits else 0)
