#!/usr/bin/env python3
"""Generate the synthetic dataset for the feedback-learning benchmark
(FLB, graft.FlbRunner). Deterministic, seed 42.

The LongMemEval-shaped set from gen_memeval.py draws each question's
topics independently from a 2000-word vocabulary, so in the FLB's
SHARED-corpus regime (one store, every question retrieves over all
25k sessions) cross-question collisions are rare and baseline R@5
saturates at ~0.97 — no headroom for feedback to move anything. The
reference's real dataset sits at R@5 ~0.26 in this regime
(benchmarks/results-flb-oracle-v1.0-phase1.json round 1) precisely
because sessions from DIFFERENT questions look alike.

This generator reproduces that hardness knob: topics come from a
GLOBAL pool of 40, so ~600 sessions corpus-wide share the answer's
topic and flood the top-k; the question leans on topic words (12) with
only 2 answer-unique words, leaving the answer near-tied with hundreds
of look-alikes. Oracle feedback (answer USED, look-alikes IGNORED) is
then exactly the disambiguation signal the benchmark exists to
measure.

Usage: gen_flb.py <out.json>   then
  SPARK_GRAFT_CPUS=32 sbt "runMain graft.FlbRunner <out.json> oracle 3 0.05,0.15,0.3"
"""
import json
import random
import sys

random.seed(42)
TYPES = ["single-session-user", "multi-session", "temporal-reasoning", "knowledge-update"]
VOCAB = [f"w{i}" for i in range(2000)]
# The global topic pool — the collision knob.
TOPICS = [[random.choice(VOCAB) for _ in range(20)] for _ in range(40)]

with open(sys.argv[1], "w") as f:
    for qid in range(500):
        topic_ids = [random.randrange(40) for _ in range(10)]
        hay, toks_of = [], {}
        for s in range(50):
            sid = qid * 1000 + s
            topic = TOPICS[topic_ids[s // 5]]
            uniq = [random.choice(VOCAB) for _ in range(10)]
            toks = topic + uniq
            random.shuffle(toks)
            toks_of[s] = (topic, uniq)
            hay.append({"session_id": sid, "text": f"session {sid} " + " ".join(toks)})
        ans_idx = qid % 50
        topic, uniq = toks_of[ans_idx]
        qtoks = (random.sample(topic, 12) + random.sample(uniq, 2)
                 + [random.choice(VOCAB) for _ in range(2)])
        random.shuffle(qtoks)
        f.write(json.dumps({
            "question_id": qid,
            "question": "question " + " ".join(qtoks),
            "answer_session_id": qid * 1000 + ans_idx,
            "question_type": TYPES[qid % 4],
            "haystack": hay}) + "\n")
print(f"wrote {sys.argv[1]}")
