#!/bin/bash
# Fetch PASCAL VOC 2007 trainval + test and untar into $1 (default ~/data).
# Produces $DIR/VOCdevkit/VOC2007/{Annotations,JPEGImages,ImageSets,...}
set -euo pipefail
DIR="${1:-$HOME/data}"
mkdir -p "$DIR"
cd "$DIR"
BASE=http://host.robots.ox.ac.uk/pascal/VOC/voc2007
for f in VOCtrainval_06-Nov-2007.tar VOCtest_06-Nov-2007.tar; do
  echo "downloading $f ..."
  curl -LO "$BASE/$f"
  tar -xf "$f"
  rm -f "$f"
done
echo "VOC2007 ready under $DIR/VOCdevkit"
