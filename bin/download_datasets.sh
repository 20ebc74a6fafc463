#!/bin/bash
# Fetch ann-benchmarks datasets and convert to the npy triplet layout the
# harness expects (role parity with the reference's
# bin/download_ann_benchmarks_datasets.sh). Usage:
#   bin/download_datasets.sh [data_dir] [dataset ...]
# Default datasets mirror the reference's benchmark set.
set -euo pipefail
DATA_DIR=${1:-data}
shift || true
DATASETS=("$@")
if [ ${#DATASETS[@]} -eq 0 ]; then
  DATASETS=(
    mnist-784-euclidean sift-128-euclidean glove-25-angular glove-50-angular
    glove-100-angular glove-200-angular deep-image-96-angular
    gist-960-euclidean nytimes-256-angular
  )
fi
mkdir -p "$DATA_DIR"
for ds in "${DATASETS[@]}"; do
  out="$DATA_DIR/$ds"
  mkdir -p "$out"
  h5="$out/$ds.hdf5"
  if [ ! -f "$h5" ]; then
    echo "downloading $ds..."
    wget -q -O "$h5" "https://ann-benchmarks.com/$ds.hdf5"
  fi
  # angular datasets are L2-normalized at conversion time (IP == angular
  # over unit vectors; the reference normalizes at download via --normalize)
  if [[ "$ds" == *angular* ]]; then
    python benchmarks/convert_datasets.py hdf5 "$h5" "$out" --normalize
  else
    python benchmarks/convert_datasets.py hdf5 "$h5" "$out"
  fi
done
echo "done."
