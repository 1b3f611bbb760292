#!/bin/bash
# Full fine-tune from a pretrained checkpoint
# (reference training_scripts/transfer_full.sh).
cgat-train --pretrained-model "${PRETRAINED:?set PRETRAINED=<run dir>}" \
           --data-path "${DATA_PATH:-data/}" --epochs 100 "$@"
