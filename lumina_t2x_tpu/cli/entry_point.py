"""`lumina` / `lumina_next` console CLI.

Counterpart of the reference click CLI (`lumina_next_t2i/entry_point.py:93-156`,
`utils/cli.py:77-332`, `utils/group.py:1-90`): a group whose *default*
subcommand is `infer` (so `lumina "a prompt" out/` works bare), a YAML-driven
settings file (transport / ode / infer sections, `configs/infer/settings.yaml`),
and a `convert` command translating checkpoints between our Orbax layout and
the reference's .pth/.safetensors formats.
"""

from __future__ import annotations

import json
import os

import click


class DefaultGroup(click.Group):
    """click Group with a default subcommand (`utils/group.py:28-90`)."""

    def __init__(self, *args, **kwargs):
        self.default_cmd_name = kwargs.pop("default", None)
        super().__init__(*args, **kwargs)

    def resolve_command(self, ctx, args):
        try:
            return super().resolve_command(ctx, args)
        except click.UsageError:
            if self.default_cmd_name is None:
                raise
            cmd = self.get_command(ctx, self.default_cmd_name)
            return self.default_cmd_name, cmd, args


DEFAULT_SETTINGS = {
    "transport": {"path_type": "Linear", "prediction": "velocity", "loss_weight": None,
                  "sample_eps": None, "train_eps": None},
    "ode": {"atol": 1e-6, "rtol": 1e-3, "reverse": False, "likelihood": False},
    "infer": {"resolution": "1024x1024", "num_sampling_steps": 30, "cfg_scale": 4.0,
              "solver": "midpoint", "t_shift": 4, "seed": 0, "scaling_method": "Time-aware",
              "scaling_watershed": 0.3, "proportional_attn": True},
}


def load_settings(config_path):
    if config_path and not os.path.exists(config_path):
        click.echo(f"note: config {config_path!r} not found; using built-in defaults", err=True)
    if config_path and os.path.exists(config_path):
        import yaml

        with open(config_path) as f:
            loaded = yaml.safe_load(f)
        if isinstance(loaded, list):  # reference stores a single-element list
            loaded = loaded[0] if loaded else None
        if not isinstance(loaded, dict):  # empty / comment-only yaml -> None
            return DEFAULT_SETTINGS
        out = {k: {**DEFAULT_SETTINGS.get(k, {}), **(loaded.get(k) or {})} for k in
               set(DEFAULT_SETTINGS) | set(loaded)}
        return out
    return DEFAULT_SETTINGS


@click.group(cls=DefaultGroup, default="infer")
def main():
    """Lumina-T2X (TPU-native)."""


@main.command()
@click.argument("text", type=str)
@click.argument("output_path", type=str, default="out", required=False)
@click.option("-c", "--config", type=str, default="configs/infer/settings.yaml")
@click.option("--ckpt", type=str, default=None)
@click.option("--model", type=str, default="NextDiT_2B_patch2")
@click.option("--debug", is_flag=True, default=False)
def infer(text, output_path, config, ckpt, model, debug):
    """Generate an image for TEXT into OUTPUT_PATH (`utils/cli.py:271-332`)."""
    from ..pipelines.sample import main as sample_main

    s = load_settings(config)
    infer_cfg, ode_cfg = s["infer"], s["ode"]
    os.makedirs(output_path, exist_ok=True)
    prompt_file = os.path.join(output_path, "_prompt.txt")
    with open(prompt_file, "w") as f:
        f.write(text + "\n")
    # scaling_method "None" disables the time-aware watershed switch — the
    # demo's semantics (`demo.py:439-445`): watershed 1.0 means pure linear
    # RoPE scaling for the whole trajectory
    watershed = (infer_cfg["scaling_watershed"]
                 if infer_cfg.get("scaling_method", "Time-aware") == "Time-aware"
                 else 1.0)
    argv = [
        "--model", model,
        "--image_save_path", output_path,
        "--caption_path", prompt_file,
        "--resolution", f"1:{infer_cfg['resolution']}",
        "--num_sampling_steps", str(infer_cfg["num_sampling_steps"]),
        "--solver", str(infer_cfg["solver"]),
        "--cfg_scale", str(infer_cfg["cfg_scale"]),
        "--time_shifting_factor", str(infer_cfg["t_shift"]),
        "--scaling_watershed", str(watershed),
        "--seed", str(infer_cfg["seed"]),
        "--atol", str(ode_cfg["atol"]),
        "--rtol", str(ode_cfg["rtol"]),
    ]
    if infer_cfg.get("proportional_attn"):
        argv.append("--proportional_attn")
    if ckpt:
        argv += ["--ckpt", ckpt]
    if debug:
        argv.append("--debug")
    sample_main(argv)
    click.echo(f"saved to {output_path}")


@main.command()
@click.argument("source", type=str)
@click.argument("dest", type=str)
@click.option("--n_layers", type=int, default=24)
@click.option("--direction", type=click.Choice(["to_jax", "to_safetensors"]), default="to_jax")
def convert(source, dest, n_layers, direction):
    """Convert checkpoints: reference .pth/.safetensors <-> our format
    (`entry_point.py:115-156`)."""
    import numpy as np

    from ..core.checkpoint import (
        export_next_dit_weights,
        import_next_dit_weights,
        load_torch_state_dict,
        save_safetensors,
    )

    if direction == "to_jax":
        sd = load_torch_state_dict(source)
        params = import_next_dit_weights(sd, n_layers=n_layers)
        import orbax.checkpoint as ocp

        # save under <dest>/ema: the layout every consumer restores from
        # (sample.py / demo / trainer --init_from look for the 'ema' subtree
        # of a checkpoint directory) — so `--ckpt <dest>` works as-is
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(os.path.abspath(dest), "ema"), params, force=True)
        ckptr.wait_until_finished()
        click.echo(f"imported {len(sd)} tensors -> {dest}/ema")
    else:
        import orbax.checkpoint as ocp

        # accept a checkpoint DIRECTORY (trainer step dir or convert output):
        # prefer its ema subtree, then model, else treat it as the raw tree
        src = os.path.abspath(source)
        for sub in ("ema", "model"):
            if os.path.isdir(os.path.join(src, sub)):
                src = os.path.join(src, sub)
                break
        params = ocp.PyTreeCheckpointer().restore(src)
        sd = export_next_dit_weights(params)
        save_safetensors({k: np.asarray(v) for k, v in sd.items()}, dest)
        click.echo(f"exported {len(sd)} tensors -> {dest}")


def main_next():
    """`lumina_next` alias (`pyproject.toml:62-64`)."""
    main()


if __name__ == "__main__":
    main()
