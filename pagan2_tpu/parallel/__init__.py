from .jobs import (JobBatch, prepare_job, pad_and_stack, run_batch,
                   make_jobs_mesh)
