#!/bin/bash
# Fetch COCO 2017 train/val/test images + instance annotations into $1/COCO.
set -euo pipefail
DIR="${1:-$HOME/data}/COCO"
mkdir -p "$DIR"
cd "$DIR"
for f in train2017.zip val2017.zip test2017.zip; do
  echo "downloading $f ..."
  curl -LO "http://images.cocodataset.org/zips/$f"
  unzip -q "$f"
  rm -f "$f"
done
curl -LO http://images.cocodataset.org/annotations/annotations_trainval2017.zip
unzip -q annotations_trainval2017.zip
rm -f annotations_trainval2017.zip
curl -LO http://images.cocodataset.org/annotations/image_info_test2017.zip
unzip -q image_info_test2017.zip
rm -f image_info_test2017.zip
echo "COCO2017 ready under $DIR"
