#!/usr/bin/env bash
# Stage 2 — full-model HD finetune
# (reference llada-hd-llada-s2.sh: anyres pinpoints, lr 2e-5 with vision
#  tower at 2e-6, ZeRO-3 -> fsdp mesh, cosine_with_min_lr, in-training
#  lite evals.  Effective global batch matches the reference's 128 =
#  8 GPUs x 4/device x accum 4; on v5e-8 the instantaneous batch cap is
#  16 (B=32 OOMs by 1.9G, NOTES_ROUND5 AOT table) so it's 16 x accum 8.)
python train.py \
  --data-path "${DATA:-scripts/stage2.yaml}" \
  --model-path runs/stage1/checkpoint-2200 \
  --tokenizer-path "${BASE:-ckpts/llada-8b-instruct}" \
  --output-dir runs/stage2 \
  --tunable mm_mlp_adapter,mm_vision_tower,mm_language_model \
  --lr 2e-5 --vision-tower-lr 2e-6 --warmup-ratio 0.03 \
  --batch-size 16 --grad-accum 8 --steps 10000 \
  --dp 1 --fsdp 8 --tp 1 \
  --eval-tasks chartqa --eval-every 1000 --eval-limit 64
