from s3grl_tpu.utils.seeding import seed_everything

__all__ = ["seed_everything"]
