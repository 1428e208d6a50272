#!/usr/bin/env bash
# Fetch the VQA-v2 + MS-COCO files the real-data pipeline consumes
# (reference README.md:264-272 documents the same sources by hand).
# Needs network access; ~20 GB for train2014 images.
#
# Usage: scripts/download_data.sh [DATA_DIR]   (default ./data_store)
set -euo pipefail

DATA=${1:-data_store}
mkdir -p "$DATA/raw"
cd "$DATA/raw"

fetch() {  # fetch <url> — skip when the zip is already extracted
    local url=$1 zip
    zip=$(basename "$url")
    if [ -e "${zip%.zip}" ]; then
        echo "[data] ${zip%.zip} already present, skipping"
        return
    fi
    echo "[data] fetching $url"
    curl -fLO --retry 3 "$url"
    unzip -q "$zip" && rm -f "$zip"
}

# VQA v2 (questions + annotations; visualqa.org/download.html)
fetch https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Questions_Train_mscoco.zip
fetch https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Annotations_Train_mscoco.zip

# MS-COCO train2014 images (the split VQA-v2 train questions reference)
fetch http://images.cocodataset.org/zips/train2014.zip

cd - >/dev/null
echo
echo "[data] done. Train with:"
echo "  python -m vqa_tpu.training.train \\"
echo "      --questions $DATA/raw/v2_OpenEnded_mscoco_train2014_questions.json \\"
echo "      --annotations $DATA/raw/v2_mscoco_train2014_annotations.json \\"
echo "      --images-dir $DATA/raw/train2014"
echo
echo "Sanity-check alignment first:"
echo "  python -m vqa_tpu.data.dataset \\"
echo "      $DATA/raw/v2_OpenEnded_mscoco_train2014_questions.json \\"
echo "      $DATA/raw/v2_mscoco_train2014_annotations.json \\"
echo "      $DATA/raw/train2014"
