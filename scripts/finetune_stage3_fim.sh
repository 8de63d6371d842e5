#!/usr/bin/env bash
# Stage 3 — FIM infilling finetune
# (reference llada-hd-llada-s3-fim.sh + stage3_fim.yaml: 80% assistant-turn
#  infill corruption, IS_INFILLE_MODEL -> --fim)
python train.py \
  --data-path "${DATA:-scripts/stage3_fim.yaml}" \
  --model-path runs/stage2/checkpoint-10000 \
  --tokenizer-path "${BASE:-ckpts/llada-8b-instruct}" \
  --output-dir runs/stage3_fim \
  --tunable mm_mlp_adapter,mm_language_model \
  --lr 1e-5 --batch-size 4 --steps 4000 \
  --dp 1 --fsdp 8 --tp 1 \
  --fim
