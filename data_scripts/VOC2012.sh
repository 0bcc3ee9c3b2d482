#!/bin/bash
# Fetch PASCAL VOC 2012 trainval and untar into $1 (default ~/data).
set -euo pipefail
DIR="${1:-$HOME/data}"
mkdir -p "$DIR"
cd "$DIR"
f=VOCtrainval_11-May-2012.tar
echo "downloading $f ..."
curl -LO "http://host.robots.ox.ac.uk/pascal/VOC/voc2012/$f"
tar -xf "$f"
rm -f "$f"
echo "VOC2012 ready under $DIR/VOCdevkit"
