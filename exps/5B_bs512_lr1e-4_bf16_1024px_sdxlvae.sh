#!/usr/bin/env bash
# Lumina-T2I 5B Flag-DiT staged recipe — counterpart of the reference's
# lumina_t2i/exps/5B_bs512_lr1e-4_bf16_1024px_sdxlvae.sh:1-33 (3 stages
# 256 -> 512 -> 1024 px on 8 -> 16 -> 32 GPUs; here the same schedule on a
# TPU slice — scale via --model_parallel_size + more hosts, same flags).
# The reference pairs the 5B Flag-DiT with the LLaMA-2-7B text encoder and
# the SDXL VAE.
set -e
DATA=${DATA:-configs/data/example.yaml}
COMMON=(--model DiT_Llama_5B_patch2 --data_path "$DATA"
        --results_dir results/t2i_5b
        --data_parallel fsdp --precision bf16 --grad_precision fp32
        --qk_norm --checkpointing
        --model_parallel_size "${MP:-4}"
        --text_encoder meta-llama/Llama-2-7b-hf
        --cap_feat_dim 4096 --max_caption_len 128
        --vae sdxl --vae_ckpt "${VAE_CKPT:-sdxl-vae.safetensors}"
        --caption_dropout_prob 0.1 --grad_clip 2.0 --auto_resume)

# stage 1: 256px (reference: 8 GPUs, bs512, lr1e-4)
python -m lumina_t2x_tpu.pipelines.train "${COMMON[@]}" \
  --image_size 256 --global_batch_size 512 --lr 1e-4 --max_steps 200000
# stage 2: 512px (reference: 16 GPUs, micro-bs 8)
python -m lumina_t2x_tpu.pipelines.train "${COMMON[@]}" \
  --image_size 512 --global_batch_size 512 --micro_batch_size 8 --lr 1e-4 --max_steps 300000
# stage 3: 1024px (reference: 32 GPUs, micro-bs 2)
python -m lumina_t2x_tpu.pipelines.train "${COMMON[@]}" \
  --image_size 1024 --global_batch_size 512 --micro_batch_size 2 --lr 1e-4 --max_steps 400000
