"""`terran-tpu` console entry point (ref: /root/reference/terran/cli.py)."""

import click

from terran_tpu.checkpoint import checkpoint_cmd


@click.group()
def cli():
    pass


cli.add_command(checkpoint_cmd)


if __name__ == "__main__":
    cli()
