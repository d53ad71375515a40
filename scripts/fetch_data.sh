#!/bin/bash
# Fetch the publicly downloadable assets into data/ (same layout as the
# reference implementation; see docs/DATA.md for the full tree).
#
# Only the two pretrained checkpoints are freely fetchable. Everything
# else (SMPL body models, TUCH essentials, MTP/DSC datasets) is gated
# behind registration — docs/DATA.md lists where to get each piece and
# where it goes.
set -euo pipefail

DATA_DIR="${TUCH_DATA_DIR:-data}"
mkdir -p "$DATA_DIR"

# SPIN pretrained HMR checkpoint (initializes training; demo fallback)
wget -nc http://visiondata.cis.upenn.edu/spin/model_checkpoint.pt \
    -O "$DATA_DIR/spin_model_checkpoint.pt"

# TUCH final checkpoint (for demo_tuch / eval parity runs)
wget -nc https://download.is.tue.mpg.de/tuch/tuch_model_checkpoint.pt \
    -O "$DATA_DIR/tuch_model_checkpoint.pt"

echo "Done. Gated assets (SMPL models, essentials, datasets) must be"
echo "fetched manually after registration — see docs/DATA.md."
