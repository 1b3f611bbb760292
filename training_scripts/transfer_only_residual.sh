#!/bin/bash
# Residual-only transfer: train just the output head
# (reference training_scripts/transfer_only_residual.sh).
cgat-train --pretrained-model "${PRETRAINED:?set PRETRAINED=<run dir>}" \
           --data-path "${DATA_PATH:-data/}" --epochs 100 --only-residual "$@"
