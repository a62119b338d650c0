#!/usr/bin/env python3
"""Generate the synthetic LongMemEval-shaped question set used for the
IR baselines in bench/r05_ir_{hash,w2v}.json (deterministic, seed 42).

Shape: 500 questions x 50-session haystacks, 10 topics x 5 sessions per
haystack. Same-topic sessions share 20 topic words (of a 2000-word
vocabulary) plus 10 unique words each; the question samples 12 topic
words (shared with 4 same-topic distractors), 3 of the answer's unique
words, and 3 noise words — so retrieval is not exact-match and
MRR/NDCG have headroom to move between embedding providers.

Usage: gen_memeval.py <out.json>   then
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.MemEvalRunner <out.json> 5"
"""
import json
import random
import sys

random.seed(42)
TYPES = ["single-session-user", "multi-session", "temporal-reasoning", "knowledge-update"]
VOCAB = [f"w{i}" for i in range(2000)]

with open(sys.argv[1], "w") as f:
    for qid in range(500):
        topics = [[random.choice(VOCAB) for _ in range(20)] for _ in range(10)]
        hay, toks_of = [], {}
        for s in range(50):
            sid = qid * 1000 + s
            topic = topics[s // 5]
            uniq = [random.choice(VOCAB) for _ in range(10)]
            toks = topic + uniq
            random.shuffle(toks)
            toks_of[s] = (topic, uniq)
            hay.append({"session_id": sid, "text": f"session {sid} " + " ".join(toks)})
        ans_idx = qid % 50
        topic, uniq = toks_of[ans_idx]
        qtoks = (random.sample(topic, 12) + random.sample(uniq, 3)
                 + [random.choice(VOCAB) for _ in range(3)])
        random.shuffle(qtoks)
        f.write(json.dumps({
            "question_id": qid,
            "question": "question " + " ".join(qtoks),
            "answer_session_id": qid * 1000 + ans_idx,
            "question_type": TYPES[qid % 4],
            "haystack": hay}) + "\n")
print(f"wrote {sys.argv[1]}")
