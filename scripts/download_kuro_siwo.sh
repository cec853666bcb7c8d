#!/usr/bin/env bash
# Fetch + extract the Kuro Siwo dataset release.
#
# Usage: ./scripts/download_kuro_siwo.sh <ROOT_DIR> [manifest]
#
# Capability parity with the reference downloader (catalogue + 11 tarballs,
# failure tracking, extraction), driven by a manifest file so mirrors can be
# swapped without editing the script. Failed artifacts are listed in
# <ROOT_DIR>/failed_downloads.txt and the script retries each once.
set -u

ROOT="${1:?usage: download_kuro_siwo.sh <root-dir> [manifest]}"
MANIFEST="${2:-$(dirname "$0")/kuro_siwo_urls.txt}"
mkdir -p "$ROOT/data"
FAILED="$ROOT/failed_downloads.txt"
: > "$FAILED"

fetch() {
  local name="$1" url="$2" dest="$ROOT/$1"
  # dropbox share links need dl=1 for a direct download
  url="${url/dl=0/dl=1}"
  echo ">>> $name"
  wget -q --show-progress -O "$dest" "$url" || wget -q -O "$dest" "$url"
}

while read -r name url; do
  [[ -z "$name" || "$name" == \#* ]] && continue
  if ! fetch "$name" "$url"; then
    echo "$name" >> "$FAILED"
    continue
  fi
  case "$name" in
    *.tar.gz|*.tgz)
      echo "    extracting $name"
      if tar -xzf "$ROOT/$name" -C "$ROOT/data"; then
        rm -f "$ROOT/$name"
      else
        echo "$name (extract)" >> "$FAILED"
      fi
      ;;
  esac
done < "$MANIFEST"

if [[ -s "$FAILED" ]]; then
  echo "Some artifacts failed; retrying once:"
  cat "$FAILED"
  RETRY=$(cat "$FAILED"); : > "$FAILED"
  while read -r name _extract; do
    url=$(awk -v n="$name" '$1==n {print $2}' "$MANIFEST")
    [[ -z "$url" ]] && continue
    fetch "$name" "$url" || echo "$name" >> "$FAILED"
  done <<< "$RETRY"
fi

if [[ -s "$FAILED" ]]; then
  echo "FAILED downloads remain (see $FAILED)"; exit 1
fi
echo "Kuro Siwo download complete under $ROOT"
