from .sharding import (make_mesh, render_sharded, shard_train_step,  # noqa: F401
                        ShardedTrainer)
