#!/usr/bin/env bash
# Provenance manifest for the per-round leak/copy scans.
#
# The driver-side LEAKCHECK/COPYCHECK artifacts carry no file count,
# git SHA, or timestamp, so a clean artifact is indistinguishable from
# a stale one. This script records, from the builder side, exactly
# WHAT tree was scanned — run it at the end of a round and commit
# SCAN_MANIFEST.json alongside the code it describes.
#
# It also re-runs a local self-scan of the same leak classes the
# driver checks (network endpoints, cloud bucket URIs, non-public
# imports) so the committed manifest is itself evidence, not just
# bookkeeping.
set -euo pipefail
cd "$(dirname "$0")/.."

SHA=$(git rev-parse HEAD)
DIRTY=$(git status --porcelain | wc -l | tr -d ' ')
TS=$(date -u +%Y-%m-%dT%H:%M:%SZ)

FILES=$(git ls-files 'src/*.scala' | sort)
N_FILES=$(echo "$FILES" | wc -l | tr -d ' ')
N_LOC=$(echo "$FILES" | xargs cat | wc -l | tr -d ' ')
# content fingerprint of the scanned set: stable across checkouts
TREE_HASH=$(echo "$FILES" | xargs sha256sum | sha256sum | cut -d' ' -f1)

# leak self-scan over main+test sources:
#  - network endpoints (http/https URLs outside apache.org/spark docs)
#  - cloud bucket URIs (s3/gs/abfs/hdfs with a host)
#  - imports outside the public universe (org.apache, scala, java,
#    javax, graft, org.scalatest, org.scalacheck, com.esotericsoftware
#    [kryo, shipped inside Spark])
URL_HITS=$({ echo "$FILES" | xargs grep -nE 'https?://' \
  | grep -vE 'apache\.org|github\.com|arxiv\.org|aclanthology|w3\.org|example\.com|wikipedia\.org|duckdb\.org|scala-lang\.org' \
  || true; } | grep -c . || true)
BUCKET_HITS=$({ echo "$FILES" | xargs grep -nE '(s3a?|gs|abfss?|wasbs?)://[a-z0-9]' || true; } | grep -c . || true)
IMPORT_HITS=$({ echo "$FILES" | xargs grep -nE '^import ' \
  | grep -vE 'import (org\.apache\.|scala\.|java\.|javax\.|graft\.|org\.scalatest|org\.scalacheck|com\.esotericsoftware)' \
  || true; } | grep -c . || true)

cat > SCAN_MANIFEST.json <<EOF
{
  "git_sha": "$SHA",
  "dirty_files": $DIRTY,
  "scanned_at_utc": "$TS",
  "scanned_files": $N_FILES,
  "scanned_loc": $N_LOC,
  "tree_sha256": "$TREE_HASH",
  "self_scan": {
    "nonpublic_urls": $URL_HITS,
    "bucket_uris": $BUCKET_HITS,
    "nonpublic_imports": $IMPORT_HITS
  }
}
EOF
cat SCAN_MANIFEST.json
