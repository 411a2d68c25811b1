#!/bin/bash
# Fetch the released 3D-SDN weights and the Virtual KITTI 1.3.1 dataset
# into the on-disk layout sdn3d_tpu expects, mirroring the reference's
# models/download_models.sh and datasets/download_vkitti.sh.
#
# Usage:
#   bash scripts/fetch_assets.sh [ASSETS_ROOT]     # default ./assets
#
# Produces (and what consumes each piece):
#   $ASSETS_ROOT/models/vkitti-semantic/encoder_epoch_*.pth, decoder_epoch_*.pth
#   $ASSETS_ROOT/models/vkitti-geometric-derender3d/model-*.ckpt
#   $ASSETS_ROOT/models/vkitti-geometric-maskrcnn/mask_rcnn_vkitti_0100.pth
#   $ASSETS_ROOT/models/vkitti-textural/*_net_{G,E,D}.pth
#       -> export SDN3D_MODELS_DIR=$ASSETS_ROOT/models
#          consumed by sdn3d_tpu/utils/port.py converters and the
#          calibrated-parity tests (tests/test_real_weights.py activate
#          automatically once the env var points at this tree).
#   $ASSETS_ROOT/vkitti/vkitti_1.3.1_{rgb,scenegt,motgt,extrinsicsgt}/
#       -> export VKITTI_ROOT_DIR=$ASSETS_ROOT/vkitti
#          consumed by data/vkitti*.py, the train/test CLIs and the
#          92-pair edit benchmark (see MIGRATION.md "Environment
#          variables").
#
# Offline behavior: each download is attempted independently and failures
# are reported at the end; the script never deletes partial state other
# than its own temporary tarballs, and exits 0 only when everything it
# attempted is in place.

set -u

ASSETS_ROOT=${1:-./assets}
MODELS_DIR="$ASSETS_ROOT/models"
VKITTI_DIR="$ASSETS_ROOT/vkitti"
FAILED=()

fetch_tar() {  # url, dest_dir, tar_flags
    local url=$1 dest=$2 flags=$3
    local tmp
    tmp=$(mktemp /tmp/sdn3d_fetch.XXXXXX)
    echo ">> $url"
    if curl --fail --location --connect-timeout 15 -o "$tmp" "$url"; then
        mkdir -p "$dest"
        tar "$flags" -f "$tmp" -C "$dest" || FAILED+=("extract: $url")
    else
        echo "   FAILED (no egress / server down): $url"
        FAILED+=("$url")
    fi
    rm -f "$tmp"
}

echo "== pretrained weights -> $MODELS_DIR (models/download_models.sh:1)"
for TARGET in geometric-derender3d geometric-maskrcnn semantic textural; do
    fetch_tar "http://3dsdn.csail.mit.edu/assets/vkitti-$TARGET.tar.gz" \
        "$MODELS_DIR" -zx
done

echo "== Virtual KITTI 1.3.1 -> $VKITTI_DIR (datasets/download_vkitti.sh:1)"
VK_BASE=http://download.europe.naverlabs.com/virtual-kitti-1.3.1
fetch_tar "$VK_BASE/vkitti_1.3.1_motgt.tar.gz" "$VKITTI_DIR" -zx
fetch_tar "$VK_BASE/vkitti_1.3.1_extrinsicsgt.tar.gz" "$VKITTI_DIR" -zx
fetch_tar "$VK_BASE/vkitti_1.3.1_scenegt.tar" "$VKITTI_DIR" -x
fetch_tar "$VK_BASE/vkitti_1.3.1_rgb.tar" "$VKITTI_DIR" -x

echo
if [ ${#FAILED[@]} -gt 0 ]; then
    echo "INCOMPLETE — ${#FAILED[@]} download(s) failed:"
    printf '  %s\n' "${FAILED[@]}"
    echo "Re-run when egress is available, or place the files manually in"
    echo "the layout documented at the top of this script."
    exit 1
fi
echo "Done.  Activate with:"
echo "  export SDN3D_MODELS_DIR=$(cd "$MODELS_DIR" 2>/dev/null && pwd || echo "$MODELS_DIR")"
echo "  export VKITTI_ROOT_DIR=$(cd "$VKITTI_DIR" 2>/dev/null && pwd || echo "$VKITTI_DIR")"
