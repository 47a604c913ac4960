#!/bin/bash
# Fetch the reference datasets (cat/human meshes, posed-view datasets,
# discretizations, shape descriptors, texture-transfer shapes) from the
# TUM webshare — the same nine archives as the reference's
# download_data.sh (reference download_data.sh:1-11), unpacked into the
# same data/ layout so the reference preprocessing scripts and the
# configs/texture_reconstruction etc. configs work unchanged.
#
# INF_DATA_URL_BASE overrides the archive source. A value that is a local
# DIRECTORY is copied from instead of fetched — which is also how the
# fetch/unpack/overwrite/failure logic is tested offline
# (tests/test_download_data.py). INF_DATA_POINTS (space-separated, no .zip)
# overrides the archive list for such tests.
#
# In a zero-egress environment the downloads fail; in that case use the
# built-in synthetic data path instead:
#   scripts/run_synthetic_end_to_end.sh   # builds data/synthetic{,_hq}/ and trains
#   tools/make_synthetic_dataset.py       # the generator itself
set -u

urlBase="${INF_DATA_URL_BASE:-https://vision.in.tum.de/webshare/g/intrinsic-neural-fields/data}"

mkdir -p data

if [ -n "${INF_DATA_POINTS:-}" ]; then
    read -r -a dataPoints <<< "${INF_DATA_POINTS}"
else
    dataPoints=("cat_rescaled_rotated" "cat_dataset_v2_tiny" "cat_tri" "discretizations" "human" "human_dataset_v2_tiny" "human_tri" "shape_descriptors" "texture_transfer")
fi

fetch() {
    # fetch <name>.zip into data/ — local-directory copy or wget
    if [ -d "${urlBase}" ]; then
        cp "${urlBase}/$1.zip" data/
    else
        wget "${urlBase}/$1.zip" -P data
    fi
}

fail=0
for dataPoint in "${dataPoints[@]}"; do
    if fetch "${dataPoint}"; then
        unzip -o "data/${dataPoint}.zip" -d data
        rm -f "data/${dataPoint}.zip"
    else
        echo "FAILED to fetch ${dataPoint}.zip" >&2
        fail=1
    fi
done

if [ "$fail" -ne 0 ]; then
    cat >&2 <<'EOF'

Some downloads failed. If this machine has no internet egress, the framework
is fully exercisable on the built-in synthetic datasets:

    bash scripts/run_synthetic_end_to_end.sh    # preprocess + train + eval
    bash scripts/run_model_families.sh          # every baseline family
    bash scripts/run_transfer.sh                # texture transfer + discretization-agnosticism

EOF
    exit 1
fi
