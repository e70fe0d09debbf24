"""Generated protobuf modules (protoc --python_out of proto/herdsman.proto).

Regenerate with:  protoc -Iproto --python_out=herdsman_tpu/service/_proto \
                        proto/herdsman.proto
(or `python -m herdsman_tpu.service.proto_build`).
"""
