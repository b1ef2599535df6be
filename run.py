"""CLI entry: python run.py -m BPR -d ml-100k [--flags from the model config]."""
from recstudio_tpu.quickstart import run
from recstudio_tpu.utils import (add_model_arguments, get_default_parser,
                                 get_model, parser2nested_dict)

if __name__ == "__main__":
    parser = get_default_parser()
    args, _ = parser.parse_known_args()
    _, default_conf = get_model(args.model)
    parser = add_model_arguments(parser, default_conf)
    args = parser.parse_args()
    overrides = parser2nested_dict(args)
    run(args.model, args.dataset, model_config=overrides or None,
        run_mode=args.mode)
