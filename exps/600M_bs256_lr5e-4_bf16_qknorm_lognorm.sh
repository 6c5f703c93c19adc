#!/usr/bin/env bash
# ImageNet 256x256 class-conditional recipe — counterpart of the reference's
# Next-DiT-ImageNet/exps/600M_bs256_lr5e-4_bf16_qknorm_lognorm.sh:
# global bs 256, lr 5e-4, bf16 params + fp32 grads, qk-norm, lognorm SNR.
# One process drives all local TPU chips; multi-host runs set
# JAX_COORDINATOR_ADDRESS and launch this on every host.
python -m lumina_t2x_tpu.pipelines.train \
  --model NextDiT_ImageNet_600M_patch2 \
  --data_path "${IMAGENET_DIR:-/data/imagenet/train}" \
  --results_dir results/imagenet_600m \
  --image_size 256 \
  --global_batch_size 256 \
  --micro_batch_size 32 \
  --data_parallel sdp \
  --precision bf16 --grad_precision fp32 \
  --qk_norm \
  --snr_type lognorm \
  --lr 5e-4 --wd 0.0 --grad_clip 2.0 \
  --max_steps 900000 \
  --ckpt_every 50000 \
  --vae_ckpt "${VAE_CKPT:-sd-vae-ft-ema.safetensors}" \
  --auto_resume
