from graal_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    sharded_log_likelihood,
    make_sharded_em_step,
)
