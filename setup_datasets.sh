#!/usr/bin/env bash
# Dataset provisioning for the SED2012 (MediaEval Social Event Detection 2012)
# benchmark — the reference workload's data (reference setup_datasets.sh:8-33).
#
# Downloads the metadata XML, the three ground-truth event lists, and the
# photo tarballs into dataset/sed2012/.  The pipeline itself only needs the
# XML + txt files (photos are kept for completeness with the reference).
set -euo pipefail

DATASET_DIR="dataset/sed2012"
BASE_URL="${SED2012_BASE_URL:-http://skuld.cs.umass.edu/traces/mmsys/2013/social2012}"

mkdir -p "${DATASET_DIR}"
cd "${DATASET_DIR}"

# Integrity: if a SHA256SUMS file is present (env SED2012_SHA256SUMS, or
# SHA256SUMS in the dataset dir), every downloaded archive is verified
# against it BEFORE extraction and the script fails loudly on mismatch.
# The first machine with network access should record sums right after a
# trusted download:  sha256sum <files> > dataset/sed2012/SHA256SUMS
SUMS_FILE="${SED2012_SHA256SUMS:-SHA256SUMS}"

verify() {
    local name="$1"
    if [ ! -f "${SUMS_FILE}" ]; then
        echo "WARNING: no ${SUMS_FILE}; skipping checksum for ${name}" >&2
        return 0
    fi
    if ! grep -q " ${name}\$" "${SUMS_FILE}"; then
        echo "WARNING: ${name} not listed in ${SUMS_FILE}; skipping" >&2
        return 0
    fi
    grep " ${name}\$" "${SUMS_FILE}" | sha256sum -c - \
        || { echo "CHECKSUM MISMATCH for ${name} — refusing to extract" >&2
             rm -f "${name}"; exit 1; }
}

fetch() {
    local name="$1"
    if [ -e "${name%.zip}" ] || [ -e "${name}" ]; then
        echo "have ${name}, skipping"
        return
    fi
    echo "fetching ${name}"
    wget -q "${BASE_URL}/${name}"
    verify "${name}"
    case "${name}" in
        *.zip) unzip -o -q "${name}" && rm -f "${name}" ;;
        *.tar.gz) tar xzf "${name}" && rm -f "${name}" ;;
    esac
}

fetch sed2012_metadata.xml.zip
fetch technical_events.txt
fetch soccer_events.txt
fetch indignados_events.txt

# photo tarballs (optional for the pipeline; comment out to save ~40GB)
for part in 1 2 3 4; do
    fetch "sed2012_photos_part${part}.tar.gz" || echo "photos part ${part} unavailable; continuing"
done

echo "SED2012 ready under ${DATASET_DIR}/"
