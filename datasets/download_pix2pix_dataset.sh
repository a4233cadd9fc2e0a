#!/usr/bin/env bash
# Fetch a pix2pix dataset (cityscapes, maps, ...)
# (reference datasets/download_pix2pix_dataset.sh).
set -e
NAME=$1
if [ -z "$NAME" ]; then echo "usage: $0 <dataset_name>"; exit 1; fi
URL="http://efrosgans.eecs.berkeley.edu/pix2pix/datasets/${NAME}.tar.gz"
mkdir -p database
wget -N "$URL" -O "database/${NAME}.tar.gz"
tar -xzf "database/${NAME}.tar.gz" -C database/
rm "database/${NAME}.tar.gz"
cd "database/${NAME}"
[ -e val ] || ln -s test val
