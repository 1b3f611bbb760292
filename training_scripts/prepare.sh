#!/bin/bash
# Shard-parallel featurisation (reference Utilities/prepare.sh): run one
# cgat-prepare per shard file in parallel.
for f in "${SOURCE_DIR:-.}"/data_*.pickle.gz; do
  cgat-prepare --file "$(basename "$f")" --source-dir "${SOURCE_DIR:-.}" \
               --target-dir "${TARGET_DIR:-prepared}" &
done
wait
