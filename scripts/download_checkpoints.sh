#!/bin/bash
# Fetch the published guided-diffusion checkpoints the reference uses
# (reference download.sh equivalent; requires network egress).
set -e
mkdir -p model_zoo
wget "https://openaipublic.blob.core.windows.net/diffusion/jul-2021/256x256_diffusion_uncond.pt" \
     -O model_zoo/256x256_diffusion_uncond.pt
pip install gdown
gdown --id 1BGwhRWUoguF-D8wlZ65tf227gp3cDUDh -O model_zoo/diffusion_ffhq_10m.pt
