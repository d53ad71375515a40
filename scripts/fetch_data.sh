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

# Download to a temp name and move into place only on success, so a
# failed attempt never leaves a 0-byte checkpoint that blocks retries.
fetch() {
    url="$1"; dest="$2"
    if [ -s "$dest" ]; then
        echo "$dest already present; skipping"
        return 0
    fi
    wget "$url" -O "$dest.part"
    mv "$dest.part" "$dest"
}

# SPIN pretrained HMR checkpoint (initializes training; demo fallback)
fetch http://visiondata.cis.upenn.edu/spin/model_checkpoint.pt \
    "$DATA_DIR/spin_model_checkpoint.pt"

# TUCH final checkpoint (for demo_tuch / eval parity runs)
fetch https://download.is.tue.mpg.de/tuch/tuch_model_checkpoint.pt \
    "$DATA_DIR/tuch_model_checkpoint.pt"

echo "Done. Gated assets (SMPL models, essentials, datasets) must be"
echo "fetched manually after registration — see docs/DATA.md."
