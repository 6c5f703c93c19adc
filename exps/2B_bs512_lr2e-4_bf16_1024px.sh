#!/usr/bin/env bash
# Lumina-Next 2B T2I staged recipe — counterpart of
# lumina_t2i/exps/5B_bs512_lr1e-4_bf16_1024px_sdxlvae.sh (3 stages
# 256 -> 512 -> 1024 px, FSDP, bf16 + fp32 grads, qk-norm).
set -e
DATA=${DATA:-configs/data/example.yaml}
COMMON=(--model NextDiT_2B_patch2 --data_path "$DATA"
        --results_dir results/t2i_2b
        --data_parallel fsdp --precision bf16 --grad_precision fp32
        --qk_norm --checkpointing
        --text_encoder google/gemma-2b
        --vae sdxl --vae_ckpt "${VAE_CKPT:-sdxl-vae.safetensors}"
        --caption_dropout_prob 0.1 --grad_clip 2.0 --auto_resume)

# stage 1: 256px
python -m lumina_t2x_tpu.pipelines.train "${COMMON[@]}" \
  --image_size 256 --global_batch_size 512 --lr 2e-4 --max_steps 200000
# stage 2: 512px
python -m lumina_t2x_tpu.pipelines.train "${COMMON[@]}" \
  --image_size 512 --global_batch_size 512 --micro_batch_size 8 --lr 1e-4 --max_steps 300000
# stage 3: 1024px
python -m lumina_t2x_tpu.pipelines.train "${COMMON[@]}" \
  --image_size 1024 --global_batch_size 512 --micro_batch_size 2 --lr 1e-4 --max_steps 400000
