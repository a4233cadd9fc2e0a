#!/usr/bin/env bash
# Fetch a CycleGAN dataset (horse2zebra, maps, ...) and create val symlinks
# (reference datasets/download_cyclegan_dataset.sh; Berkeley-hosted zips).
set -e
NAME=$1
if [ -z "$NAME" ]; then echo "usage: $0 <dataset_name>"; exit 1; fi
URL="http://efrosgans.eecs.berkeley.edu/cyclegan/datasets/${NAME}.zip"
mkdir -p database
wget -N "$URL" -O "database/${NAME}.zip"
unzip -o "database/${NAME}.zip" -d database/
rm "database/${NAME}.zip"
cd "database/${NAME}"
[ -e valA ] || ln -s testA valA
[ -e valB ] || ln -s testB valB
