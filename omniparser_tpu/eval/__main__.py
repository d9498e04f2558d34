"""ScreenSpot-Pro eval CLI.

    python -m omniparser_tpu.eval --dataset ss_pro.jsonl --out log.jsonl \
        --model gpt-4o --base_url https://api.openai.com/v1

dataset rows: {"img_path", "instruction", "gt_bbox" (ratio xyxy), "group"}.
Without an API key, --mock runs the scripted LLM (smoke test).
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser("omniparser_tpu screenspot eval")
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", default="eval_log.jsonl")
    ap.add_argument("--model", default="gpt-4o")
    ap.add_argument("--base_url", default="https://api.openai.com/v1")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--mock", action="store_true")
    args = ap.parse_args()

    from omniparser_tpu.config import PipelineConfig
    from omniparser_tpu.eval.screenspot import ScreenSpotModel, run_eval
    from omniparser_tpu.pipeline import SOMPipeline

    rows = [json.loads(l) for l in open(args.dataset) if l.strip()]
    if args.limit:
        rows = rows[: args.limit]

    if args.mock:
        from omniparser_tpu.agent.llm import MockLLM

        llm = MockLLM(["Click BBox ID: 0"] * len(rows))
    else:
        from omniparser_tpu.agent.llm import OpenAICompatClient

        llm = OpenAICompatClient(args.model, base_url=args.base_url)

    model = ScreenSpotModel(SOMPipeline(PipelineConfig()), llm)
    scores = run_eval(model, rows, log_path=args.out)
    print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
