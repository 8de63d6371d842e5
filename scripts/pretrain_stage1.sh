#!/usr/bin/env bash
# Stage 1 — projector-only alignment pretraining
# (reference scripts/train/exps/cluster/pretrain_llada.sh: plain template,
#  lr 1e-3, frozen tower+LM, 558K caption pairs, ZeRO-2 -> here fsdp mesh)
python train.py \
  --data-path "${DATA:-data/blip_558k.json}" \
  --image-folder "${IMAGES:-data/images}" \
  --model-path "${BASE:-ckpts/llada-8b-instruct}" \
  --tokenizer-path "${BASE:-ckpts/llada-8b-instruct}" \
  --output-dir runs/stage1 \
  --tunable mm_mlp_adapter \
  --lr 1e-3 --warmup-ratio 0.03 \
  --batch-size 32 --steps 2200 \
  --dp 1 --fsdp 8 --tp 1 \
  --adapter-only-save
