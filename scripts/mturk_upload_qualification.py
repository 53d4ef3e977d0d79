"""Upload a qualification test to MTurk
(reference: scripts/mturk_upload_qualification.py).

Requires boto3 with AWS credentials; without boto3 the script can still
compile and write the XML/mockup artifacts via ``--xml-dir``.
"""
import argparse
import pathlib

from neuron_descriptions_tpu.mturk import qualification

SANDBOX_URL = "https://mturk-requester-sandbox.us-east-1.amazonaws.com"
PROD_URL = "https://mturk-requester.us-east-1.amazonaws.com"


def main() -> None:
    parser = argparse.ArgumentParser("upload qualification test")
    parser.add_argument("config", type=pathlib.Path,
                        help="path to yaml config")
    parser.add_argument("--no-display-progress", action="store_true")
    parser.add_argument("--no-validate-urls", action="store_true",
                        help="do not validate image urls")
    parser.add_argument("--mockup-file", type=pathlib.Path,
                        help="write mockup to this file")
    parser.add_argument("--xml-dir", type=pathlib.Path,
                        help="write questions/answers XML here instead of "
                        "(or in addition to) uploading")
    parser.add_argument("--name", default="detailed image summarizer",
                        help="qualification name (or id, if updating)")
    parser.add_argument(
        "--description",
        default="A simple two-question multiple choice test that measures "
        "attention to detail in image summarization.",
        help="description of the test for workers")
    parser.add_argument("--keyword", action="append", dest="keywords",
                        default=["image", "summarization"],
                        help="add a keyword to the qualification")
    parser.add_argument("--retry-delay-seconds", type=int, default=120)
    parser.add_argument("--test-duration-seconds", type=int, default=1800)
    parser.add_argument("--aws-profile", help="aws profile to use")
    parser.add_argument("--prod", dest="endpoint_url", action="store_const",
                        const=PROD_URL, default=SANDBOX_URL,
                        help="upload to production mturk, not sandbox")
    parser.add_argument("--update", action="store_true",
                        help="update qualification instead of creating one")
    parser.add_argument("--no-upload", action="store_true",
                        help="compile XML only; do not contact AWS")
    args = parser.parse_args()

    config = qualification.parse_yaml_config(
        args.config,
        validate_urls=not args.no_validate_urls,
        display_progress=not args.no_display_progress)
    questions = qualification.generate_questions_xml(config)
    answers = qualification.generate_answers_xml(config)

    if args.mockup_file:
        args.mockup_file.write_text(
            qualification.generate_mockup_html(config))
    if args.xml_dir:
        args.xml_dir.mkdir(exist_ok=True, parents=True)
        (args.xml_dir / "questions.xml").write_text(questions)
        (args.xml_dir / "answers.xml").write_text(answers)
    if args.no_upload:
        return

    import boto3
    boto3.setup_default_session(profile_name=args.aws_profile)
    client = boto3.client("mturk", endpoint_url=args.endpoint_url)
    common = dict(
        RetryDelayInSeconds=args.retry_delay_seconds,
        QualificationTypeStatus="Active",
        Description=args.description,
        Test=questions,
        AnswerKey=answers,
        TestDurationInSeconds=args.test_duration_seconds,
        AutoGranted=False,
    )
    if args.update:
        client.update_qualification_type(QualificationTypeId=args.name,
                                         **common)
    else:
        client.create_qualification_type(
            Name=args.name, Keywords=",".join(args.keywords), **common)


if __name__ == "__main__":
    main()
