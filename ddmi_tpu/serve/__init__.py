from ddmi_tpu.serve.server import (  # noqa: F401
    SamplerService,
    make_http_server,
    serve_http,
)
