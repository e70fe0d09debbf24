from herdsman_tpu.client.herd_client import HerdClient  # noqa: F401
