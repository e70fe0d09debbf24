"""(Re)generate the protobuf message modules from proto/herdsman.proto."""

from __future__ import annotations

import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
OUT = ROOT / "herdsman_tpu" / "service" / "_proto"


def build() -> None:
    subprocess.run(
        [
            "protoc",
            f"-I{ROOT / 'proto'}",
            f"--python_out={OUT}",
            str(ROOT / "proto" / "herdsman.proto"),
        ],
        check=True,
    )


def load_pb2():
    if not (OUT / "herdsman_pb2.py").exists():
        build()
    if str(OUT) not in sys.path:
        sys.path.insert(0, str(OUT))
    import herdsman_pb2  # noqa: PLC0415

    return herdsman_pb2


if __name__ == "__main__":
    build()
    print(f"generated {OUT}/herdsman_pb2.py")
