#!/bin/bash
# Reference-equivalent training driver (reference training_scripts/train.sh):
# seed ensemble over the default CGAT config.
for seed in 0 1 2; do
  cgat-train --data-path "${DATA_PATH:-data/}" --target e_above_hull_new \
             --epochs 390 --batch-size 64 --clr-period 130 --seed "$seed" \
             "$@"
done
